package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the write-side lever that makes
  * MULTI-dimensional selective scans cheap at 100 TB (Morton 1966; the
  * same layout Delta/Iceberg OPTIMIZE ZORDER applies). A table sorted by
  * one column prunes scans filtered on that column and nothing else;
  * interleaving the bits of two (or more) columns gives every file AND
  * every parquet row group a tight min/max envelope on EACH dimension, so
  * footer-stats skipping (plain parquet) or file-stats pruning (any
  * stats-aware table format) works for filters on any participating
  * column — at the cost of slightly looser envelopes per dimension than a
  * dedicated single-column sort.
  *
  * Spark shape: the z-value is a pure projection (a fold over bit
  * positions — a HOF, NOT codegen'd, which is fine on the write path: a
  * one-off layout cost amortized over every future scan);
  * `repartitionByRange` on it range-partitions the table into
  * z-contiguous files and `sortWithinPartitions` makes row groups
  * z-contiguous inside each file. Locality (few files hold any box
  * query's rows) is what LayoutSpec proves, per dimension, against a
  * linear layout.
  */
object ZOrderLayout {

  /** Bit-interleaved z-value of two non-negative int columns (a in the
    * even bit positions, b in the odd), `bits` low bits each — 16 bits
    * covers 65k distinct values per dimension, plenty for bucketed or
    * dictionary-coded layout keys (scale inputs down first if wider).
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftrightunsigned", a.cast("long"), i).bitwiseAND(lit(1L)),
          i * 2))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftrightunsigned", b.cast("long"), i).bitwiseAND(lit(1L)),
          i * 2 + 1)))
  }

  /** Write `df` z-ordered on (aCol, bCol) into `path` as ~`numFiles`
    * z-contiguous parquet files (row groups z-contiguous within each).
    */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
                    numFiles: Int = 16, bits: Int = 16): Unit =
    df.withColumn("__z", zvalue(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Files whose rows intersect `pred` — the locality a stats-aware
    * reader turns into skipped I/O (counts distinct source files among
    * the matching rows).
    */
  def filesTouched(df: DataFrame, pred: Column): Long =
    df.filter(pred).select(input_file_name()).distinct().count()
}
