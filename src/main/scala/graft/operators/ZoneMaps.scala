package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file zone maps (min / max / null count per column) and the
  * file-skipping read they enable — the data-skipping half of the layout
  * story (ZOrderLayout is the clustering half; zone maps turn its
  * locality into files that are never opened). This is the same
  * metadata-pruning design Delta/Iceberg file statistics and parquet
  * row-group stats implement; materializing it as a side table makes the
  * pruning decision a metadata-sized driver step, independent of any
  * table format.
  *
  * Scale shape: `build` is ONE column-pruned scan producing a
  * file-count-sized table (metadata, not data — the same order as a
  * Delta log replay); `readPruned`'s plan-time work is a scan of that
  * zone-map table, and its data-side plan reads only surviving files.
  * On a 100 TB table laid out by ZOrderLayout or a range sort, a narrow
  * range predicate opens a handful of files instead of all of them.
  */
object ZoneMaps {

  /** Build the zone-map table for `cols` of the parquet tree at `path`:
    * one row per data file with per-column min/max/null-count. One scan,
    * column-pruned to `cols`, combined map-side per file.
    */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zone maps need at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}__min"),
      max(col(c)).as(s"${c}__max"),
      sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nulls")))
    spark.read.parquet(path)
      .select(cols.map(col): _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Range read through the zone map: open only files whose [min, max]
    * envelope on `c` intersects [lo, hi], then apply the exact predicate
    * to the surviving rows.
    *
    * Soundness: a file with max < lo or min > hi cannot hold a matching
    * row; a file whose min/max are NULL holds only NULLs in `c`, which
    * fail any range predicate — the null-propagating NOT(…) filter drops
    * those files too, correctly. Completeness is by contrapositive: any
    * matching row's value lies in its file's envelope, so its file
    * survives. Result therefore EQUALS full-scan-plus-filter (proved in
    * ZoneMapsSpec against shuffled layouts).
    *
    * Returns (rows, filesRead, filesTotal). The file-list collect is
    * metadata-sized (one string per file), the standard driver-side
    * pruning step of every stats-based reader.
    */
  def readPruned(spark: SparkSession, path: String, zonemap: DataFrame,
                 c: String, lo: Any, hi: Any): (DataFrame, Long, Long) = {
    val total = zonemap.count()
    val keep = zonemap
      .filter(!(col(s"${c}__max") < lit(lo) || col(s"${c}__min") > lit(hi)))
      .select("file").collect().map(_.getString(0))
    val pruned =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(lit(false)) // typed empty frame
      else spark.read.parquet(keep.toIndexedSeq: _*)
    (pruned.filter(col(c) >= lit(lo) && col(c) <= lit(hi)),
      keep.length.toLong, total)
  }
}
