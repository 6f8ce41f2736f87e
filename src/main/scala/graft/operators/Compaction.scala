package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the OPTIMIZE-style operational pass every
  * long-lived table needs: streaming sinks, per-batch upserts and
  * over-parallel writers leave thousands of KB-sized parquet files, and
  * at 100 TB the resulting footer/open/seek overhead (plus driver-side
  * listing and scheduling one task per tiny split) dominates scans long
  * before the data does.
  *
  * Shape: plan from FILE METADATA ONLY (one listing — no data read to
  * decide), rewrite ONLY the files below `smallBytes` into
  * ceil(total/targetBytes) files, leave the already-right-sized files
  * untouched, and commit by atomic directory swap: new files land in a
  * `.compact-tmp` sibling, then small originals are deleted and the
  * compacted files moved in. The rewrite itself is one
  * `spark.read.parquet(smallFiles).repartition(n).write` — fully
  * parallel, no shuffle beyond the explicit repartition.
  *
  * Returns (files_before, files_after, bytes_compacted).
  */
object Compaction {

  def compact(spark: SparkSession, dir: String,
              smallBytes: Long = 8L << 20,
              targetBytes: Long = 128L << 20): (Long, Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val small = files.filter(_.getLen < smallBytes)
    if (small.size < 2) return (files.size.toLong, files.size.toLong, 0L)
    val totalSmall = small.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalSmall.toDouble / targetBytes).toInt)
    val tmp = new Path(dir, ".compact-tmp")
    fs.delete(tmp, true)
    spark.read.parquet(small.map(_.getPath.toString): _*)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // commit: drop the small originals, move the compacted files in
    small.foreach(f => fs.delete(f.getPath, false))
    val moved = fs.listStatus(tmp).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    moved.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new Path(dir, s"compacted-$i-${f.getPath.getName}"))
    }
    fs.delete(tmp, true)
    val after = files.size - small.size + moved.size
    (files.size.toLong, after.toLong, totalSmall)
  }
}
