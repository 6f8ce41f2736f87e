package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contiguous token-budget packing — assign documents (in doc_id order)
  * to fixed-token-budget bins, the sequence-packing shape a training-data
  * pipeline uses to fill context windows. bin(d) = ⌊tokens_before(d) /
  * budget⌋, i.e. a document opens a new bin when the running total crosses
  * the budget boundary (bins may overhang by one partial document — the
  * streaming-packer convention; no document is split).
  *
  * Scale shape: the naive formulation is a global-ORDER-BY window cumsum —
  * a single reducer holding the whole corpus (exactly what the DuckDB
  * oracle runs). This implementation is the distributed two-pass prefix
  * sum instead: range-repartition on doc_id (sampled balanced splits),
  * per-partition token totals (one tiny job collecting `partitions`
  * longs), then each partition streams its rows once adding its prefix
  * offset. No global sort, no single-reducer stage; the only full-data
  * movement is the one range exchange. The second pass reuses the first's
  * shuffle output (same lineage), so the exchange is paid once.
  */
object TokenPacker {

  /** (doc_id, n_tokens, bin) for every document, bin-packed in doc_id
    * order against `budget` tokens per bin.
    */
  def packContiguous(docs: DataFrame, budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val rdd = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(partitions, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    // pass 1: per-partition token totals — `partitions` longs to the driver
    val partSums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    // pass 2: running sum within each partition, shifted by its offset
    rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var run = offsets(i)
        it.map { case (id, nt) =>
          val before = run; run += nt; (id, nt, before / budget)
        }
      }
      .toDF("doc_id", "n_tokens", "bin")
      .orderBy("doc_id")
  }
}
