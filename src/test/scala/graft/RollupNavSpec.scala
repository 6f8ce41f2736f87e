package graft

import graft.operators.RollupNav
import org.apache.spark.sql.functions._

/** Aggregate navigator (operators.RollupNav): routed answers are
  * bit-identical to fact-table recomputation at every grain, the
  * router refuses what the cube cannot answer, and a day-ranged
  * question prunes the rollup store at the directory level.
  */
class RollupNavSpec extends SparkSpec {

  private def base = Tables.events(spark, sfDir)
    .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"),
      (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v_us"))

  private val shape = RollupNav.Rollup(Seq("event_type"), Seq("v_us"))

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_navspec").toString

  test("routed == recomputed on every measure, at day and month grain") {
    val dir = tmp()
    try {
      RollupNav.materialize(base, shape, dir)
      for (grain <- Seq("day", "month")) {
        val routed = RollupNav.answer(spark, dir, shape,
          Seq("event_type"), grain).get
        val direct = base
          .groupBy(col("event_type"),
            (grain match {
              case "day" => col("day")
              case _ => date_trunc(grain, col("day")).cast("date")
            }).as("grain"))
          .agg(count(lit(1)).as("n_rows"), sum("v_us").as("v_us_sum"),
            min("v_us").as("v_us_min"), max("v_us").as("v_us_max"))
          .withColumn("v_us_avg",
            expr("(2 * v_us_sum + n_rows) div (2 * n_rows)"))
        assert(routed.exceptAll(direct).isEmpty &&
          direct.exceptAll(routed).isEmpty,
          s"routed answer diverges from fact recomputation at grain=$grain")
      }
    } finally Fs.rmTree(dir)
  }

  test("router refuses dims outside the cube and grains finer than stored") {
    val dir = tmp()
    try {
      RollupNav.materialize(base, shape, dir)
      assert(RollupNav.answer(spark, dir, shape, Seq("user_id"), "month").isEmpty,
        "user_id is not a cube dim — must not be answerable")
      assert(RollupNav.answer(spark, dir, shape, Seq("event_type"), "hour").isEmpty,
        "hour is finer than the day grain — must not be answerable")
    } finally Fs.rmTree(dir)
  }

  test("incremental maintenance == one-shot materialize (merge and new-day paths)") {
    val oneShot = tmp()
    try {
      RollupNav.materialize(base, shape, oneShot)
      val truth = RollupNav.answer(spark, oneShot, shape, Seq("event_type"), "day").get

      // merge pressure: three user slices, every batch touches every day
      val merged = tmp()
      try {
        RollupNav.materialize(base.filter(col("user_id") % 3 === 0), shape, merged)
        RollupNav.maintain(spark, merged, shape, base.filter(col("user_id") % 3 === 1))
        RollupNav.maintain(spark, merged, shape, base.filter(col("user_id") % 3 === 2))
        val inc = RollupNav.answer(spark, merged, shape, Seq("event_type"), "day").get
        assert(inc.exceptAll(truth).isEmpty && truth.exceptAll(inc).isEmpty,
          "user-sliced maintenance diverges from one-shot materialize")
      } finally Fs.rmTree(merged)

      // new-day path: the second batch's days do not exist in the store yet
      val grown = tmp()
      try {
        RollupNav.materialize(base.filter(col("day") < "2024-01-15"), shape, grown)
        RollupNav.maintain(spark, grown, shape, base.filter(col("day") >= "2024-01-15"))
        val inc = RollupNav.answer(spark, grown, shape, Seq("event_type"), "day").get
        assert(inc.exceptAll(truth).isEmpty && truth.exceptAll(inc).isEmpty,
          "new-day maintenance diverges from one-shot materialize")
      } finally Fs.rmTree(grown)
    } finally Fs.rmTree(oneShot)
  }

  test("batchId markers: partial apply + replay recovers to exactly-once per day") {
    def answers(dir: String) =
      RollupNav.answer(spark, dir, shape, Seq("event_type"), "day").get
    val dir = tmp()
    val truthDir = tmp()
    try {
      RollupNav.materialize(base.filter(col("day") < "2024-01-10"), shape, dir)
      val batch = base.filter(col("day").between("2024-01-10", "2024-01-11"))
      // crash simulation: the trigger died after applying only Jan 10
      RollupNav.maintain(spark, dir, shape,
        batch.filter(col("day") === "2024-01-10"), Some(2L))
      // replay of the full trigger: Jan 10 skips (marker), Jan 11 applies
      RollupNav.maintain(spark, dir, shape, batch, Some(2L))
      // a second replay is a complete no-op
      RollupNav.maintain(spark, dir, shape, batch, Some(2L))
      RollupNav.materialize(base.filter(col("day") <= "2024-01-11"), shape, truthDir)
      val (inc, truth) = (answers(dir), answers(truthDir))
      assert(inc.exceptAll(truth).isEmpty && truth.exceptAll(inc).isEmpty,
        "replayed/partially-applied maintenance double-counted or lost a day")
    } finally { Fs.rmTree(dir); Fs.rmTree(truthDir) }
  }

  test("RollupSink: a fact stream maintains the cube to the one-shot answer") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = base
      .select(col("day").cast("string"), col("event_type"), col("v_us"))
      .as[(String, String, Long)].collect().toSeq
    val slices = rows.grouped((rows.size + 2) / 3).toSeq
    val dir = tmp()
    val ckpt = tmp()
    try {
      val in = MemoryStream[(String, String, Long)]
      val q = graft.streaming.RollupSink.start(
        in.toDF().toDF("day", "event_type", "v_us"), dir, shape, ckpt)
      try slices.foreach { s => in.addData(s); q.processAllAvailable() }
      finally q.stop()
      val streamed = RollupNav.answer(spark, dir, shape, Seq("event_type"), "day").get
      val oneShotDir = tmp()
      try {
        RollupNav.materialize(base, shape, oneShotDir)
        val truth = RollupNav.answer(spark, oneShotDir, shape, Seq("event_type"), "day").get
        assert(streamed.exceptAll(truth).isEmpty && truth.exceptAll(streamed).isEmpty,
          "streamed cube diverges from one-shot materialize")
      } finally Fs.rmTree(oneShotDir)
    } finally { Fs.rmTree(dir); Fs.rmTree(ckpt) }
  }

  test("entry sweep heals a crash between the swap renames (no day ever lost)") {
    val dir = tmp()
    try {
      RollupNav.materialize(base, shape, dir)
      val truth = RollupNav.answer(spark, dir, shape, Seq("event_type"), "day").get
        .collect().toSeq
      // simulate the worst crash window: a day renamed aside, the new dir
      // never moved in, plus a torn staging dir
      val day = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("day=")).sorted.head
        .stripPrefix("day=")
      java.nio.file.Files.move(
        new java.io.File(dir, s"day=$day").toPath,
        new java.io.File(dir, s".old_day_$day").toPath)
      val torn = new java.io.File(dir, s".tmp_day_$day")
      torn.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(torn, "junk").toPath, "not parquet")
      // any maintain call sweeps first; an empty batch is a pure sweep
      RollupNav.maintain(spark, dir, shape, base.filter(lit(false)))
      val healed = RollupNav.answer(spark, dir, shape, Seq("event_type"), "day").get
        .collect().toSeq
      assert(healed.toSet == truth.toSet, "pre-crash state not restored")
      assert(!new java.io.File(dir, s".tmp_day_$day").exists())
      assert(!new java.io.File(dir, s".old_day_$day").exists())
    } finally Fs.rmTree(dir)
  }

  test("day-ranged answer prunes the rollup store at the directory level") {
    val dir = tmp()
    try {
      RollupNav.materialize(base, shape, dir)
      val ranged = RollupNav.answer(spark, dir, shape, Seq("event_type"),
        "day", Some(("2024-01-03", "2024-01-05"))).get
      ranged.collect()
      val plan = ranged.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(day"),
        s"day range must prune partitions:\n$plan")
      // and the ranged answer equals the unranged one filtered after the fact
      val full = RollupNav.answer(spark, dir, shape, Seq("event_type"), "day").get
        .filter(col("grain").between("2024-01-03", "2024-01-05"))
      assert(ranged.exceptAll(full).isEmpty && full.exceptAll(ranged).isEmpty)
    } finally Fs.rmTree(dir)
  }
}
