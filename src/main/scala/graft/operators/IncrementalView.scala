package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over the snapshot store's
  * change-data-feed — at 100 TB you do not recompute a corpus-wide
  * aggregate because one partition changed; you fold the CDC delta into
  * the stored view. Cost tracks CHANGE volume end-to-end:
  * [[MergeInto.diffSnapshots]] reads only the manifests' symmetric
  * difference, and the fold below shuffles only (changed rows + |view|)
  * — never the base table.
  *
  * Supported aggregates: COUNT and SUM — the self-decomposable ones. A
  * deleted row subtracts exactly what it once added (exact for BIGINT
  * and DECIMAL sums — the repo-wide money discipline; floating-point
  * sums would drift and are rejected). MIN/MAX are deliberately NOT
  * supported: a delete of the current extremum needs the base group
  * re-scanned, which breaks the change-volume cost model — recompute
  * those groups instead.
  *
  * View schema contract: (groupCols…, cnt BIGINT, sumCols…), exactly
  * what [[aggregate]] produces. Groups whose count reaches zero drop out
  * of the maintained view; fresh groups appear from the delta alone.
  */
object IncrementalView {

  private def requireExact(df: DataFrame, sumCols: Seq[String]): Unit =
    sumCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(!dt.isInstanceOf[org.apache.spark.sql.types.DoubleType] &&
              !dt.isInstanceOf[org.apache.spark.sql.types.FloatType],
        s"IncrementalView: SUM($c) over $dt would drift under +x/-x " +
          "maintenance; cast to DECIMAL first (money discipline)")
    }

  /** The full-recompute twin: (groupCols…, cnt, sumCols…) with stable
    * types across repeated maintenance (sums pinned to DECIMAL(28,2)
    * when decimal — re-aggregation would otherwise widen per round
    * until the 38-precision cap).
    */
  def aggregate(base: DataFrame, groupCols: Seq[String],
                sumCols: Seq[String]): DataFrame = {
    requireExact(base, sumCols)
    pinTypes(
      base.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("cnt"), sumCols.map(c => sum(c).as(c)): _*),
      sumCols)
  }

  /** Fold a [[MergeInto.diffSnapshots]] delta into a stored view:
    * inserts/update-afters add (+1, +values), deletes/update-befores
    * subtract (−1, −values), then one keyed re-aggregate of
    * view ∪ delta. A row moving between groups contributes to both.
    */
  def maintain(view: DataFrame, diff: DataFrame, groupCols: Seq[String],
               sumCols: Seq[String]): DataFrame = {
    // validate the STORED view too, not just the delta projection — a
    // double-typed view built outside aggregate() would otherwise bypass
    // the drift guard and silently accumulate error under +x/-x folds
    requireExact(view, sumCols)
    val plus = diff.filter(col("change").isin("insert", "update"))
      .select(groupCols.map(g => col(s"after.`$g`").as(g)) ++
        (lit(1L).as("cnt") +: sumCols.map(c => col(s"after.`$c`").as(c))): _*)
    val minus = diff.filter(col("change").isin("delete", "update"))
      .select(groupCols.map(g => col(s"before.`$g`").as(g)) ++
        (lit(-1L).as("cnt") +: sumCols.map(c => (-col(s"before.`$c`")).as(c))): _*)
    requireExact(plus, sumCols)
    pinTypes(
      view.select((groupCols.map(col) :+ col("cnt")) ++ sumCols.map(col): _*)
        .unionByName(plus).unionByName(minus)
        .groupBy(groupCols.map(col): _*)
        .agg(sum("cnt").as("cnt"), sumCols.map(c => sum(c).as(c)): _*)
        .filter(col("cnt") > 0),
      sumCols)
  }

  private def pinTypes(df: DataFrame, sumCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val pinned = df.schema.fields.map { f =>
      if (f.name == "cnt") col("cnt").cast("long").as("cnt")
      else f.dataType match {
        case d: DecimalType if sumCols.contains(f.name) =>
          col(f.name).cast(DecimalType(28, d.scale)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(pinned.toIndexedSeq: _*)
  }
}
