package graft

import graft.operators.ZOrderLayout
import org.apache.spark.sql.functions._

/** Locality proof for the z-order layout on a uniform 256×256 grid split
  * into 16 files: the 16 z-contiguous ranges tile the grid into a 4×4
  * macro-grid, so a 1/16 slice in EITHER dimension intersects ~4 files —
  * while a linear (x-sorted) layout serves the x-slice from 1 file but
  * scatters the y-slice across ALL 16. Locality is what a stats-aware
  * reader (parquet footer min/max, Delta/Iceberg file stats) turns into
  * skipped I/O.
  */
class LayoutSpec extends SparkSpec {

  test("zvalue interleaves bits (Morton order)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (7L, 5L))
      .toDF("a", "b")
      .select(ZOrderLayout.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(a,b) with a in even bits: (2,3)=0b10,0b11 → 0b1110=14;
    // (7,5)=0b111,0b101 → 0b100111 + b bits 0b011101? hand: bits
    // a=111, b=101 → z = b2 a2 b1 a1 b0 a0 = 1 1 0 1 1 1 = 0b110111=55
    assert(got == Seq(0L, 1L, 2L, 3L, 14L, 55L), s"got $got")
  }

  test("z-order layout: both dimension slices stay local; linear scatters y") {
    import spark.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x, y)))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrderLayout.writeZOrdered(grid, s"$base/zorder", "x", "y", numFiles = 16)
    val lin = spark.read.parquet(s"$base/linear")
    val zo = spark.read.parquet(s"$base/zorder")
    val xSlice = col("x") < 16
    val ySlice = col("y") < 16
    val linX = ZOrderLayout.filesTouched(lin, xSlice)
    val linY = ZOrderLayout.filesTouched(lin, ySlice)
    val zX = ZOrderLayout.filesTouched(zo, xSlice)
    val zY = ZOrderLayout.filesTouched(zo, ySlice)
    // linear: x-slice in 1 file, y-slice smeared over every file
    assert(linX <= 2, s"linear x-slice should be ~1 file, got $linX")
    assert(linY >= 12, s"linear y-slice should touch ~all 16 files, got $linY")
    // z-order: BOTH slices stay within ~a macro-grid column/row (4 of 16;
    // slack for range-partitioner boundary sampling)
    assert(zX <= 6, s"z-order x-slice should stay local, got $zX")
    assert(zY <= 6, s"z-order y-slice should stay local, got $zY")
    // total row counts are layout-invariant
    assert(lin.count() == 256L * 256 && zo.count() == 256L * 256)
  }
}
