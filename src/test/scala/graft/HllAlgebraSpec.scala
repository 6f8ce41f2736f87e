package graft

import org.apache.spark.sql.functions._

/** s_agg_hll_algebra's inclusion-exclusion overlap estimates vs exact
  * set sizes: HLL (lgK=12) carries ~1.6% relative standard error per
  * sketch; the derived intersection/difference compound a few of those,
  * so the bound here is a conservative 10% of the UNION size (the
  * denominator inclusion-exclusion actually works against).
  */
class HllAlgebraSpec extends SparkSpec {

  test("HLL inclusion-exclusion overlap tracks the exact intersection/difference") {
    val dir = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("s_agg_hll_algebra")(spark, dir).head()
    val ev = Tables.events(spark, dir)
    def users(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct()
    val a = users("view")
    val b = users("purchase")
    val exactA = a.count().toDouble
    val exactB = b.count().toDouble
    val exactBoth = a.intersect(b).count().toDouble
    val exactUnion = a.union(b).distinct().count().toDouble
    val e = (0 to 4).map(i => est.getLong(i).toDouble)
    val tol = exactUnion * 0.10
    assert(math.abs(e(0) - exactA) <= tol, s"est_view ${e(0)} vs exact $exactA")
    assert(math.abs(e(1) - exactB) <= tol, s"est_purchase ${e(1)} vs exact $exactB")
    assert(math.abs(e(2) - exactUnion) <= tol, s"est_either ${e(2)} vs exact $exactUnion")
    assert(math.abs(e(3) - exactBoth) <= tol, s"est_both ${e(3)} vs exact $exactBoth")
    assert(math.abs(e(4) - (exactUnion - exactB)) <= tol,
      s"est_view_only ${e(4)} vs exact ${exactUnion - exactB}")
    // the algebra is internally consistent by construction
    assert(e(0) + e(1) - e(2) == e(3))
  }
}
