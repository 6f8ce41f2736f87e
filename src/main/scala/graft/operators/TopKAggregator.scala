package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed bounded top-k aggregator (§2.11 UDAF surface; reference analog:
  * the sorted-set "top-k per key" worker).
  *
  * Why not a window? `row_number() OVER (PARTITION BY key ORDER BY v)`
  * shuffles and sorts EVERY row of every key. This Aggregator keeps a
  * bounded buffer of k (value, id) pairs, so map-side partial aggregation
  * reduces each partition's contribution to ≤ k rows per key before the
  * shuffle — at 100 TB that's the difference between shuffling the fact
  * table and shuffling k·keys·partitions rows.
  *
  * Determinism: ordering is (value DESC, id ASC) — the same total order as
  * the window formulation, so results are identical (ScalaTest-checked
  * against the q_win_rank_topn shape).
  *
  * Input rows are (key, value, id); the key is carried by groupByKey.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // value DESC then id ASC, using java.lang.Double.compare so NaN ranks
  // HIGHEST — exactly Spark SQL's window-sort semantics; Scala's IEEE
  // double ordering would make NaN incomparable and the sort arbitrary
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def zero: Seq[(Double, Long)] = Nil

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] = xs.sorted(ord).take(k)

  override def reduce(buf: Seq[(Double, Long)], a: (Long, Double, Long)): Seq[(Double, Long)] = {
    val item = (a._2, a._3)
    // fast path: buffer full (kept sorted by trim) and the new item ranks
    // below the current kth — O(1) reject instead of O(k log k) re-sort
    if (buf.lengthCompare(k) >= 0 && ord.lteq(buf.last, item)) buf
    else trim(item +: buf)
  }

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {

  /** Top-k orders per customer by totalprice — same semantics as
    * q_win_rank_topn's row_number()<=k, via bounded partial aggregation.
    */
  def topOrdersPerCustomer(orders: DataFrame, k: Int): DataFrame = {
    import orders.sparkSession.implicits._
    val agg = new TopKAggregator(k).toColumn.name("topk")
    orders
      .select(col("o_custkey").as("key"), col("o_totalprice").as("v"), col("o_orderkey").as("id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(agg)
      .toDF("o_custkey", "topk")
      .select(col("o_custkey"), posexplode(col("topk")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
        col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }
}
