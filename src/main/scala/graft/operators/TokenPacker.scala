package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    * order against `budget` tokens per bin, counting whitespace tokens.
    * For REAL tokenizer counts, pack [[BpeTrainer.encode]]'s output via
    * [[packCounts]] — same math, tokenizer-true budgets.
    */
  def packContiguous(docs: DataFrame, budget: Long, partitions: Int = 32): DataFrame =
    packCounts(
      docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens")),
      budget, partitions)

  /** [[packContiguous]] over precomputed (doc_id, n_tokens) counts —
    * the entry point for packing against actual tokenizer output.
    */
  def packCounts(counts: DataFrame, budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = counts.sparkSession
    import spark.implicits._
    val rdd = counts
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
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

  /** Systematic weighted sampling — the deterministic data-selection
    * primitive behind "pick ~n documents proportionally to weight": lay
    * documents on the cumulative-weight axis in doc_id order, drop a pick
    * point at every multiple of step = ⌊W / n⌋, and select each document
    * whose weight interval (cum−w, cum] covers ≥ 1 pick point. A document
    * heavier than step is picked multiple times (`n_picks` > 1) — exactly
    * proportional-to-size sampling with a deterministic grid instead of a
    * random offset, so both engines agree bit-for-bit on integer math.
    *
    * Same two-pass distributed prefix sum as [[packContiguous]] (range
    * exchange + per-partition offsets); no global sort, no single reducer.
    * Returns (doc_id, weight, cum_weight, n_picks) for selected docs,
    * ordered by doc_id.
    */
  def systematic(counts: DataFrame, n: Long, partitions: Int = 32): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val spark = counts.sparkSession
    import spark.implicits._
    val rdd = counts
      .select(col("doc_id"), col("weight").cast("long").as("weight"))
      .repartitionByRange(partitions, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val partSums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val total = offsets.last
    require(total >= n,
      s"total weight $total < sample size $n — every unit would be picked")
    val step = total / n
    rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var run = offsets(i)
        it.flatMap { case (id, w) =>
          val before = run; run += w
          val picks = run / step - before / step
          if (picks > 0) Some((id, w, run, picks)) else None
        }
      }
      .toDF("doc_id", "weight", "cum_weight", "n_picks")
      .orderBy("doc_id")
  }

  /** Global (rank, cum) over a total order — the drop-in replacement
    * for the `row_number() OVER (ORDER BY …)` + running-`SUM` global
    * window pair, which Spark executes on a SINGLE reducer (every row
    * through one task — the q_text_vocab r12 `weak`). Same shape as
    * [[packContiguous]]'s two-pass distributed prefix sum, generalized
    * to any sort order and row schema: range-repartition on the sort
    * (sampled balanced splits), sort within partitions, collect only
    * per-partition (count, sum) pairs, then one streaming pass adds the
    * offsets. `sort` must be a TOTAL order or ranks are
    * engine-dependent; `valueCol` must be LONG (exact integer running
    * totals — both engines agree bit-for-bit, the oracle doctrine).
    *
    * Returns (input columns + `rank` + `cum`, grand total). The range
    * exchange is paid once — pass 2 reuses pass 1's shuffle output.
    */
  def rankCumsum(df: DataFrame, valueCol: String, sort: Seq[Column],
                 partitions: Int = 32): (DataFrame, Long) = {
    val spark = df.sparkSession
    val vi = df.columns.indexOf(valueCol)
    require(vi >= 0, s"rankCumsum: $valueCol not in ${df.columns.mkString(", ")}")
    val rdd = df
      .repartitionByRange(partitions, sort: _*)
      .sortWithinPartitions(sort: _*)
      .rdd
    val partStats = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; s += r.getLong(vi) }
      Iterator((i, n, s))
    }.collect().sortBy(_._1)
    val cntOffsets = partStats.map(_._2).scanLeft(0L)(_ + _)
    val sumOffsets = partStats.map(_._3).scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var rank = cntOffsets(i); var run = sumOffsets(i)
      it.map { r =>
        rank += 1; run += r.getLong(vi)
        Row.fromSeq(r.toSeq :+ rank :+ run)
      }
    }
    val schema = StructType(df.schema.fields :+
      StructField("rank", LongType, nullable = false) :+
      StructField("cum", LongType, nullable = false))
    (spark.createDataFrame(out, schema), sumOffsets.last)
  }

  /** Greedy quality-ranked selection under a global token budget: rank
    * documents by (score desc, doc_id), select each document whose
    * INCLUSIVE running token total still fits (no overhang — the strict
    * budget convention), where score = distinct-token count (an exact
    * integer, so range boundaries can never straddle engines).
    *
    * Same two-pass distributed prefix sum as [[packContiguous]], ranged
    * on the (score desc, doc_id) rank order instead of doc_id — the
    * oracle's global-window cumsum without its single-reducer stage.
    * Returns (doc_id, score, n_tokens, cum_tokens) ordered by doc_id.
    */
  def selectBudget(docs: DataFrame, budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val rdd = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("score"))
      .repartitionByRange(partitions, col("score").desc, col("doc_id"))
      .sortWithinPartitions(col("score").desc, col("doc_id"))
      .rdd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val partSums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var run = offsets(i)
        it.flatMap { case (id, nt, sc) =>
          run += nt
          if (run <= budget) Some((id, sc, nt, run)) else None
        }
      }
      .toDF("doc_id", "score", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }
}
