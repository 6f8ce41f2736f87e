package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k rows per key as a FIRST-CLASS operator — the deepest
  * extension level (custom LogicalPlan + SparkStrategy + physical
  * SparkPlan pair), used where composition genuinely loses: the
  * window-function formulation (`row_number over (partition by key order
  * by ord desc) <= k`) must SHUFFLE AND SORT every input row before it
  * can discard any, while this operator prunes map-side — each input
  * partition forwards at most k rows per locally-seen key, so the
  * exchange carries O(partitions · keys · k) rows instead of the input
  * (the same shuffle-volume argument as TopKAggregator, §2.11, but as a
  * whole-row operator needing no encoder and no value packing).
  *
  * Physical shape: `TopKPerKeyFinal(ClusteredDistribution(key)) ←
  * exchange ← TopKPerKeyPartial ← child` — EnsureRequirements inserts
  * the hash exchange exactly like partial/final HashAggregate. The
  * partial phase is a safe pre-aggregation because a key's global top-k
  * is a subset of the union of its per-partition top-ks.
  *
  * Semantics: rows ordered by (`ord` DESC, `tie` ASC) per key, ties
  * broken by `tie` (must be unique per key for deterministic output —
  * the same discipline every oracle query follows). Output rows are the
  * child's rows verbatim, in no particular order (sort downstream).
  */
case class TopKPerKeyLogical(key: Expression, ord: Expression, tie: Expression,
                             k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k bound must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerKeyExec(key: Expression, ord: Expression, tie: Expression,
                          k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  // the final phase demands co-location by key; the partial phase runs
  // wherever the data already is — EnsureRequirements plants the
  // exchange between them (the partial/final HashAggregate pattern)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(Seq(key)) :: Nil

  private final class Entry(val o: Double, val t: Long, val row: InternalRow)

  override protected def doExecute(): RDD[InternalRow] = {
    val (kExpr, oExpr, tExpr, kk) = (key, ord, tie, k)
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val bKey = BindReferences.bindReference(kExpr, childOutput)
      val bOrd = BindReferences.bindReference(oExpr, childOutput)
      val bTie = BindReferences.bindReference(tExpr, childOutput)
      // head = the WORST retained entry: ascending ord, descending tie
      val cmp = new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int = {
          val c = java.lang.Double.compare(a.o, b.o)
          if (c != 0) c else java.lang.Long.compare(b.t, a.t)
        }
      }
      val heaps = new java.util.HashMap[Any, java.util.PriorityQueue[Entry]]()
      while (it.hasNext) {
        val row = it.next()
        // unsafe-row-backed values are buffer-reused — copy map keys
        val kv = bKey.eval(row) match {
          case s: UTF8String => s.copy()
          case v             => v
        }
        val o = bOrd.eval(row) match {
          case null      => Double.NegativeInfinity // nulls rank last
          case n: Number => n.doubleValue()
        }
        val t = bTie.eval(row) match {
          case null      => Long.MaxValue
          case n: Number => n.longValue()
        }
        var heap = heaps.get(kv)
        if (heap == null) { heap = new java.util.PriorityQueue[Entry](kk + 1, cmp); heaps.put(kv, heap) }
        if (heap.size < kk) heap.add(new Entry(o, t, row.copy()))
        else {
          val worst = heap.peek()
          if (o > worst.o || (o == worst.o && t < worst.t)) {
            heap.poll(); heap.add(new Entry(o, t, row.copy()))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala.map(_.row))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Planner strategy: logical TopKPerKey → partial + final exec pair. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(key, ord, tie, k, child) =>
      TopKPerKeyExec(key, ord, tie, k, partial = false,
        TopKPerKeyExec(key, ord, tie, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public entry: install the strategy (idempotent) and plan the operator
  * over a DataFrame's resolved output attributes.
  */
object GraftTopK {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  def perKey(df: DataFrame, keyCol: String, ordCol: String, tieCol: String,
             k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    // the exec evaluates ord/tie through java.lang.Number — Spark's
    // Decimal is NOT a Number, and strings/intervals would MatchError
    // per-row at execution. Fail fast at plan time with the contract:
    // numeric-primitive ord/tie only (long ord also loses precision past
    // 2^53 in the double compare — the same numeric-only contract).
    import org.apache.spark.sql.types._
    val numericPrimitive: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    for ((role, a) <- Seq("ord" -> attr(ordCol), "tie" -> attr(tieCol)))
      require(numericPrimitive.contains(a.dataType),
        s"TopKPerKey $role column '${a.name}' must be a numeric primitive " +
          s"(byte/short/int/long/float/double), got ${a.dataType.simpleString}; " +
          "cast DECIMAL explicitly if double ordering precision is acceptable")
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
      TopKPerKeyLogical(attr(keyCol), attr(ordCol), attr(tieCol), k, lp))
  }
}
