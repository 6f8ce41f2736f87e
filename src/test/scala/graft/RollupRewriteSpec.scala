package graft

import graft.operators.RollupNav
import graft.plans.RollupRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-cube routing rule (plans.RollupRewrite): a plain
  * fact-table aggregate is answered from the registered rollup with
  * identical values, the physical scan moves from the fact parquet to
  * the cube, and every non-routable shape (distinct aggs, non-cube
  * dims, unregistered scans) is left untouched.
  */
class RollupRewriteSpec extends SparkSpec {

  private def scanPaths(df: DataFrame): Seq[String] =
    PlanDigest.nodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten

  test("routed aggregate: values identical, scan moves to the cube; non-routable untouched") {
    val factDir = java.nio.file.Files.createTempDirectory("graft_rrw_fact").toString
    val cubeDir = java.nio.file.Files.createTempDirectory("graft_rrw_cube").toString
    try {
      Tables.events(spark, sfDir)
        .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v_us"))
        .write.mode("overwrite").parquet(factDir)
      val shape = RollupNav.Rollup(Seq("event_type"), Seq("v_us"))
      val fact = spark.read.parquet(factDir)
      RollupNav.materialize(fact, shape, cubeDir)
      RollupRewrite.register(spark, factDir, cubeDir, shape)
      RollupRewrite.install(spark)
      try {
        def q(df: DataFrame) = df
          .groupBy(trunc(col("day"), "month").as("month"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("v_us").as("s"),
            min("v_us").as("lo"), max("v_us").as("hi"))
          .orderBy("month", "event_type")
        val routed = q(spark.read.parquet(factDir))
        val cubeScans = scanPaths(routed)
        assert(cubeScans.forall(_.contains("graft_rrw_cube")),
          s"routed query still scans the fact table: $cubeScans")
        // truth from the fact table with routing disarmed
        RollupRewrite.clear()
        val truth = q(spark.read.parquet(factDir))
        assert(scanPaths(truth).forall(_.contains("graft_rrw_fact")))
        assert(routed.collect().toSeq == truth.collect().toSeq,
          "routed answer diverges from fact recomputation")
        // the rewrite is optimizer-side: the user-visible (analyzed) schema
        // must be untouched
        assert(routed.schema == truth.schema,
          s"routed schema drifted: ${routed.schema} vs ${truth.schema}")

        // re-arm for the negative cases
        RollupRewrite.register(spark, factDir, cubeDir, shape)
        // DISTINCT is not additive — must not route
        val distinctQ = spark.read.parquet(factDir)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("v_us")).as("nd"))
        assert(scanPaths(distinctQ).forall(_.contains("graft_rrw_fact")),
          "countDistinct was routed to the cube — unsound")
        // a grouping dim outside the cube — must not route
        val offCube = spark.read.parquet(factDir)
          .groupBy(col("user_id")).agg(sum("v_us").as("s"))
        assert(scanPaths(offCube).forall(_.contains("graft_rrw_fact")),
          "non-cube dim was routed — unsound")
        // a KEY-only filter (dim + day range) routes WITH the filter —
        // the day-range dashboard shape — and values match the fact
        def rq() = spark.read.parquet(factDir)
          .filter(col("event_type") =!= "error" && col("day") >= "2024-01-10")
          .groupBy(col("event_type")).agg(sum("v_us").as("s"))
          .orderBy("event_type")
        val ranged = rq()
        assert(scanPaths(ranged).forall(_.contains("graft_rrw_cube")),
          "key-only filtered aggregate should route to the cube")
        val rangedRows = ranged.collect().toSeq
        RollupRewrite.clear()
        assert(rq().collect().toSeq == rangedRows,
          "routed day-range answer diverges from the fact table")
        RollupRewrite.register(spark, factDir, cubeDir, shape)
        // a MEASURE-referencing filter — conservative: must not route
        val measureFiltered = spark.read.parquet(factDir)
          .filter(col("v_us") > 0)
          .groupBy(col("event_type")).agg(sum("v_us").as("s"))
        assert(scanPaths(measureFiltered).forall(_.contains("graft_rrw_fact")),
          "measure-filtered aggregate was routed — unsound")
        // a DERIVED column shadowing a measure name — routing it to the
        // raw partials would silently halve/double values (review r10)
        def shadowQ() = spark.read.parquet(factDir)
          .withColumn("v_us", col("v_us") * 2)
          .groupBy(col("event_type")).agg(sum("v_us").as("s"))
          .orderBy("event_type")
        val shadowed = shadowQ()
        assert(scanPaths(shadowed).forall(_.contains("graft_rrw_fact")),
          "alias-shadowed measure was routed — unsound")
        val gotShadow = shadowed.collect().toSeq
        RollupRewrite.clear() // routing OFF: the ground truth
        assert(shadowQ().collect().toSeq == gotShadow,
          "rule-installed shadowed aggregate diverges from ground truth")
        RollupRewrite.register(spark, factDir, cubeDir, shape)
        // a GLOBAL aggregate — sum(n_rows) over an empty cube would be
        // NULL where count(*) must be 0: must not route
        val global = spark.read.parquet(factDir).agg(count(lit(1)).as("n"))
        assert(scanPaths(global).forall(_.contains("graft_rrw_fact")),
          "global aggregate was routed — empty-cube NULL hazard")
      } finally RollupRewrite.clear()
    } finally { Fs.rmTree(factDir); Fs.rmTree(cubeDir) }
  }

  test("no staleness: a maintained cube routes fresh answers without re-register") {
    val factDir = java.nio.file.Files.createTempDirectory("graft_rrw3_fact").toString
    val cubeDir = java.nio.file.Files.createTempDirectory("graft_rrw3_cube").toString
    try {
      val all = Tables.events(spark, sfDir)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v_us"))
      val shape = RollupNav.Rollup(Seq("event_type"), Seq("v_us"))
      all.filter(col("day") < "2024-01-15")
        .write.mode("overwrite").parquet(factDir)
      RollupNav.materialize(spark.read.parquet(factDir), shape, cubeDir)
      RollupRewrite.register(spark, factDir, cubeDir, shape)
      RollupRewrite.install(spark)
      try {
        def q() = spark.read.parquet(factDir)
          .groupBy(col("event_type")).agg(sum("v_us").as("s"), count(lit(1)).as("n"))
          .orderBy("event_type")
        val before = q().collect().toSeq
        // new fact days arrive: fact parquet grows AND the cube maintains
        all.filter(col("day") >= "2024-01-15")
          .write.mode("append").parquet(factDir)
        RollupNav.maintain(spark, cubeDir, shape,
          spark.read.parquet(factDir).filter(col("day") >= "2024-01-15"))
        val after = q()
        assert(scanPaths(after).forall(_.contains("graft_rrw3_cube")),
          "maintained cube no longer routes")
        val got = after.collect().toSeq
        assert(got != before, "routed answer is stale after maintenance")
        RollupRewrite.clear()
        val truth = q().collect().toSeq
        assert(got == truth,
          "routed answer diverges from the grown fact table after maintenance")
      } finally RollupRewrite.clear()
    } finally { Fs.rmTree(factDir); Fs.rmTree(cubeDir) }
  }

  test("day-grain grouping routes through the string partition cast exactly") {
    val factDir = java.nio.file.Files.createTempDirectory("graft_rrw2_fact").toString
    val cubeDir = java.nio.file.Files.createTempDirectory("graft_rrw2_cube").toString
    try {
      Tables.events(spark, sfDir)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v_us"))
        .write.mode("overwrite").parquet(factDir)
      val shape = RollupNav.Rollup(Seq("event_type"), Seq("v_us"))
      RollupNav.materialize(spark.read.parquet(factDir), shape, cubeDir)
      RollupRewrite.register(spark, factDir, cubeDir, shape)
      RollupRewrite.install(spark)
      try {
        def q(df: DataFrame) = df.groupBy(col("day"))
          .agg(sum("v_us").as("s"), count(lit(1)).as("n")).orderBy("day")
        val routed = q(spark.read.parquet(factDir))
        assert(scanPaths(routed).forall(_.contains("graft_rrw2_cube")))
        RollupRewrite.clear()
        val truth = q(spark.read.parquet(factDir))
        assert(routed.collect().toSeq == truth.collect().toSeq)
      } finally RollupRewrite.clear()
    } finally { Fs.rmTree(factDir); Fs.rmTree(cubeDir) }
  }
}
