package graft

import graft.operators.{ZOrderLayout, ZoneMaps}
import org.apache.spark.sql.functions._

/** Zone-map file skipping: soundness (pruned read ≡ full scan + filter,
  * on ANY layout), effectiveness (sorted/z-ordered layouts open few
  * files), and the null/empty edges of the envelope test.
  */
class ZoneMapsSpec extends SparkSpec {

  test("pruned read equals full filter on sorted, shuffled and z-ordered layouts; sorted layout actually skips") {
    import spark.implicits._
    val n = 10000
    val data = (0 until n).map(i => (i.toLong, (i * 37 % n).toLong, s"r$i"))
      .toDF("k", "v", "tag")
    val base = java.nio.file.Files.createTempDirectory("graft_zm").toString
    try {
      // sorted-by-k layout: tight k envelopes per file
      data.repartitionByRange(16, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(s"$base/sorted")
      // adversarial layout: k smeared over every file (round-robin on v)
      data.repartition(16, col("v"))
        .write.mode("overwrite").parquet(s"$base/shuffled")
      ZOrderLayout.writeZOrdered(data, s"$base/zorder", "k", "v", numFiles = 16)

      for (layout <- Seq("sorted", "shuffled", "zorder")) {
        val path = s"$base/$layout"
        val zm = ZoneMaps.build(spark, path, Seq("k", "v")).localCheckpoint()
        val (pruned, read, total) = ZoneMaps.readPruned(spark, path, zm, "k", 1000L, 1999L)
        val expect = spark.read.parquet(path)
          .filter(col("k") >= 1000L && col("k") <= 1999L)
        assert(pruned.count() == 1000 && expect.count() == 1000, layout)
        assert(pruned.select("k", "v", "tag").except(expect).isEmpty &&
          expect.except(pruned.select("k", "v", "tag")).isEmpty,
          s"$layout: pruned read diverged from full filter")
        assert(total == 16, s"$layout: expected 16 files, got $total")
        if (layout == "sorted")
          assert(read <= 3, s"sorted layout should open ~1/10 of files, got $read/$total")
        if (layout == "shuffled")
          assert(read == 16, s"shuffled layout has no k-locality to exploit, got $read")
      }

      // z-order + zone maps: BOTH dimensions prune (the LayoutSpec
      // locality claim, now executed as actual skipped files)
      val zmz = ZoneMaps.build(spark, s"$base/zorder", Seq("k", "v")).localCheckpoint()
      val (_, readK, _) = ZoneMaps.readPruned(spark, s"$base/zorder", zmz, "k", 0L, 624L)
      val (_, readV, _) = ZoneMaps.readPruned(spark, s"$base/zorder", zmz, "v", 0L, 624L)
      assert(readK <= 8 && readV <= 8,
        s"z-order should prune both dims (~4/16 files), got k=$readK v=$readV")
    } finally graft.Fs.rmTree(base)
  }

  test("snapshot zone maps: incremental refresh scans only new files (sentinel proof); pruned snapshot read equals full read") {
    import spark.implicits._
    import graft.operators.{MergeInto, ZoneMaps}
    val dir = java.nio.file.Files.createTempDirectory("graft_zm_snap").toString
    try {
      // v0: three partitions, k ranges disjoint per partition
      val v0 = (0 until 300).map(i => (i.toLong, s"d${i / 100 + 1}", i * 2.0))
        .toDF("k", "day", "v")
      MergeInto.mergeFiles(spark, dir, v0, Seq("k"), "day", retainVersions = 10)
      val zm0 = ZoneMaps.forSnapshot(spark, dir, Seq("k")).localCheckpoint()

      // merge touches ONLY day=d2 → v1 carries d1/d3 files forward
      val batch = Seq((150L, "d2", 9999.0)).toDF("k", "day", "v")
      MergeInto.mergeFiles(spark, dir, batch, Seq("k"), "day", retainVersions = 10)

      // poison a carried file's stats in the prev map: if the refresh
      // rescanned it, the sentinel vanishes; reuse keeps it verbatim
      val v1files = MergeInto.manifestFiles(spark, dir, 1L)
      val carriedFile = v1files.find(_.startsWith("day=d1")).get
      val poisoned = zm0.withColumn("n_rows",
        when(col("file") === carriedFile, 999999L).otherwise(col("n_rows")))
      val zmIncr = ZoneMaps.forSnapshot(spark, dir, Seq("k"),
        prev = Some(poisoned)).localCheckpoint()
      assert(zmIncr.filter(col("file") === carriedFile)
        .head().getAs[Long]("n_rows") == 999999L,
        "incremental refresh rescanned a carried file")
      // dropped files (d2's v0 file) must not linger in the refreshed map
      assert(zmIncr.select("file").collect().map(_.getString(0)).toSet ==
        v1files.toSet, "map must cover exactly the v1 manifest")
      // modulo the sentinel, incremental ≡ full rebuild
      val zmFull = ZoneMaps.forSnapshot(spark, dir, Seq("k"))
      val a = zmIncr.filter(col("file") =!= carriedFile)
      val b = zmFull.filter(col("file") =!= carriedFile)
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        "incremental map diverged from full rebuild")

      // pruned read of the committed version: equality + actual skipping
      val (pruned, read, total) = ZoneMaps.readPrunedSnapshot(
        spark, dir, zmFull, "k", 0L, 99L)
      val expect = MergeInto.readSnapshot(spark, dir)
        .filter(col("k").between(0L, 99L))
      assert(pruned.count() == 100 && expect.count() == 100)
      assert(pruned.select("k", "v", "day").except(expect.select("k", "v", "day")).isEmpty)
      assert(read < total, s"no files skipped ($read/$total)")
    } finally graft.Fs.rmTree(dir)
  }

  test("envelope edges: disjoint range opens zero files; all-null files are skipped; nulls never match") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_zm_edge").toString
    try {
      // file 1: values 0..99; file 2: all-null ks
      (0 until 100).map(i => (Some(i.toLong), i.toLong)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$base/t")
      Seq.fill(50)((Option.empty[Long], 7L)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(s"$base/t")
      val zm = ZoneMaps.build(spark, s"$base/t", Seq("k")).localCheckpoint()
      assert(zm.count() == 2)
      // the all-null file records null min/max and 50 nulls
      assert(zm.filter(col("k__min").isNull && col("k__nulls") === 50).count() == 1)

      // in-range: only the data file opens; null rows never match
      val (hit, read1, total) = ZoneMaps.readPruned(spark, s"$base/t", zm, "k", 10L, 19L)
      assert(total == 2 && read1 == 1, s"read $read1 of $total")
      assert(hit.count() == 10)
      // disjoint range: zero files, typed empty result
      val (miss, read0, _) = ZoneMaps.readPruned(spark, s"$base/t", zm, "k", 5000L, 6000L)
      assert(read0 == 0 && miss.count() == 0)
      assert(miss.columns.toSeq == Seq("k", "v"))
    } finally graft.Fs.rmTree(base)
  }
}
