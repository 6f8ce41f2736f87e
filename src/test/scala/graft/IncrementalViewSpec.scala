package graft

import graft.operators.{IncrementalView, MergeInto}
import org.apache.spark.sql.functions._

/** Incremental view maintenance must equal full recompute, exactly, under
  * every change shape: in-place update, group move, delete-to-empty,
  * fresh group, and replayed no-change.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    IncrementalView.aggregate(df, Seq("g"), Seq("v"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSeq

  test("maintain == recompute across update, group move, delete, insert") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    try {
      def dec(d: Double) = BigDecimal(d).setScale(2)
      val v0 = Seq((1L, "a", dec(10)), (2L, "a", dec(20)), (3L, "b", dec(30)),
        (4L, "c", dec(40)))
        .toDF("id", "g", "v").withColumn("v", col("v").cast("decimal(18,2)"))
      MergeInto.mergeFiles(spark, dir, v0, Seq("id"), "g", retainVersions = 3)
      val view0 = agg(MergeInto.readSnapshot(spark, dir)).localCheckpoint()
      // update 1 in place, MOVE 2 a→b, DELETE 3 (b loses a member),
      // delete 4 (c vanishes), insert 5 into fresh group d
      val batch = Seq(
        (1L, "a", dec(11), false), (2L, "b", dec(20), false),
        (3L, "b", dec(30), true), (4L, "c", dec(40), true),
        (5L, "d", dec(50), false))
        .toDF("id", "g", "v", "del").withColumn("v", col("v").cast("decimal(18,2)"))
      MergeInto.mergeFiles(spark, dir, batch, Seq("id"), "g",
        tombstoneCol = Some("del"), retainVersions = 3)
      val diff = MergeInto.diffSnapshots(spark, dir, 0L, 1L, Seq("id"))
      val maintained = IncrementalView.maintain(view0, diff, Seq("g"), Seq("v"))
      val recomputed = agg(MergeInto.readSnapshot(spark, dir))
      assert(rows(maintained) == rows(recomputed),
        s"${rows(maintained)} vs ${rows(recomputed)}")
      // c must have dropped out entirely; d must have appeared
      val groups = rows(maintained).map(_._1)
      assert(!groups.contains("c") && groups.contains("d"), groups.toString)
      // empty diff is a no-op
      val same = IncrementalView.maintain(maintained,
        MergeInto.diffSnapshots(spark, dir, 1L, 1L, Seq("id")), Seq("g"), Seq("v"))
      assert(rows(same) == rows(maintained))
    } finally graft.Fs.rmTree(dir)
  }

  test("repeated maintenance keeps stable types (no decimal widening creep)") {
    val base = Seq((1L, "a", BigDecimal(10).setScale(2)))
      .toDF("id", "g", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    var view = agg(base)
    val t0 = view.schema("v").dataType
    val emptyDiff = base.limit(0)
      .select(col("id"), lit("insert").as("change"),
        struct(col("id"), col("g"), col("v")).as("before"),
        struct(col("id"), col("g"), col("v")).as("after"))
    for (_ <- 1 to 3) view = IncrementalView.maintain(view, emptyDiff, Seq("g"), Seq("v"))
    assert(view.schema("v").dataType == t0,
      s"sum type widened: ${view.schema("v").dataType} vs $t0")
  }

  test("double sums are rejected (would drift under +x/-x)") {
    val base = Seq((1L, "a", 10.0)).toDF("id", "g", "v")
    assertThrows[IllegalArgumentException](agg(base))
  }
}
