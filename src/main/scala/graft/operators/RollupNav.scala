package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate navigator over a materialized day-grain rollup — the OLAP
  * "answer the month query from the daily cube" pattern: materialize
  * ONE additive rollup of the fact table (day × dims, re-aggregable
  * measures only), then ROUTE coarser queries to it instead of the
  * fact table. At 100 TB the fact scan happens once per day for the
  * day's partition; every dashboard query after that reads kilobytes
  * of rollup, partition-pruned by the day directory.
  *
  * Soundness rests on measure additivity: COUNT and SUM re-aggregate by
  * SUM, MIN by MIN, MAX by MAX — and AVG is DERIVED as sum/count at
  * answer time (never stored, it does not re-aggregate). Sums are
  * stored in exact integer micro-units (the repo's fixed-point
  * doctrine), so routed answers are bit-identical to recomputation —
  * RollupNavSpec proves routed ≡ base on every measure at every grain.
  *
  * Routing is name-based and conservative: a query is answerable iff
  * its grouping dims ⊆ the rollup's dims and its grain is day or any
  * coarsening of day; anything else returns None and the caller falls
  * back to the fact table. (A DISTINCT-style measure would be a
  * counter-example to additivity — that is what the mergeable-sketch
  * rollup in [[SketchStore]] is for; compose the two for distincts.)
  */
object RollupNav {

  /** Rollup shape: grouping dims (beyond `day`) and the measure columns
    * (must be exact integer/long in the prepared base — cast money to
    * µ-units BEFORE materializing).
    */
  case class Rollup(dims: Seq[String], measures: Seq[String])

  private def aggregateRollup(base: DataFrame, rollup: Rollup): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: rollup.measures.flatMap(m => Seq(
      sum(col(m)).as(s"${m}_sum"),
      min(col(m)).as(s"${m}_min"),
      max(col(m)).as(s"${m}_max")))
    base.groupBy((col("day").cast("string") +: rollup.dims.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Materialize `base` (already carrying a `day` column and long
    * measures) into a day-partitioned rollup at `dir`. One shuffle of
    * the fact table; stored rows = |days × dim combinations|.
    */
  def materialize(base: DataFrame, rollup: Rollup, dir: String): Unit =
    aggregateRollup(base, rollup)
      .repartition(col("day"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

  /** INCREMENTAL maintenance: fold a batch of new fact rows into the
    * rollup without rescanning history. The batch partial-aggregates to
    * day grain, merges with the stored partials of ONLY the touched
    * days (directory-pruned read — partials re-aggregate because every
    * measure is additive: sums add, counts add, min/max fold), and each
    * touched day rewrites copy-on-write: tmp dir, then an atomic
    * directory swap, so a reader sees the old day or the new day, never
    * a half-written one. Driver work is bounded by days-touched per
    * batch, not data size — the foreachBatch carrier for a streaming
    * fact feed (RollupNavSpec proves batched maintenance ≡ one-shot
    * materialize, byte-identical answers).
    *
    * DELTAS ARE NOT IDEMPOTENT — a replayed batch would double-count —
    * so streaming callers pass the trigger's `batchId`: an
    * `_applied_<id>` marker is written INTO each day's tmp dir before
    * the swap, making (data + marker) publish in the same atomic
    * rename. On replay, days already carrying the marker are skipped
    * and the rest re-derive from their (still pre-batch) stored state;
    * a crash between day swaps therefore recovers to exactly-once per
    * day (RollupNavSpec's replay and partial-apply tests).
    *
    * Swap discipline (every window audited): the OLD day dir is renamed
    * aside (`.old_day_<d>`) before the new one renames in — never
    * deleted first — so pre-batch state survives any crash. The entry
    * sweep heals leftovers: an aside WITHOUT a published day dir moves
    * back (crash between the two renames), an aside WITH one deletes
    * (crash before cleanup), and stale `.tmp_day_*` staging always
    * deletes (it restages from scratch).
    */
  def maintain(spark: SparkSession, dir: String, rollup: Rollup,
               batch: DataFrame, batchId: Option[Long] = None): Unit = {
    import spark.implicits._
    recoverSwaps(dir)
    val delta0 = aggregateRollup(batch, rollup)
    val allDays = delta0.select("day").distinct().as[String].collect().sorted
    val days = batchId.fold(allDays) { id =>
      allDays.filterNot(d =>
        new java.io.File(dir, s"day=$d/_applied_$id").exists())
    }
    if (days.isEmpty) return
    // on a partial-apply replay, already-applied days must not reach the
    // merge: their delta-only rows would be wrong (history-missing)
    val delta =
      if (days.length == allDays.length) delta0
      else delta0.filter(col("day").isin(days: _*))
    // an empty cube (materialized over zero days, or day one of a fresh
    // stream) has no files to read — the delta IS the store content
    val hasDays = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .exists(_.getName.startsWith("day="))
    val existing =
      if (!hasDays) delta.filter(lit(false))
      else spark.read.parquet(dir)
        .filter(col("day").isin(days: _*)) // directory prune: touched days only
        .withColumn("day", col("day").cast("string"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val merged = existing.select(delta.columns.map(col): _*)
      .unionByName(delta)
      .groupBy((col("day") +: rollup.dims.map(col)): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        rollup.measures.flatMap(m => Seq(
          sum(col(s"${m}_sum")).as(s"${m}_sum"),
          min(col(s"${m}_min")).as(s"${m}_min"),
          max(col(s"${m}_max")).as(s"${m}_max"))): _*)
      .localCheckpoint() // materialize BEFORE the dirs it reads are swapped
    try {
      days.foreach { d =>
        val tmp = new java.io.File(dir, s".tmp_day_$d") // dot prefix: reader-invisible
        graft.Fs.rmTree(tmp.toString) // a torn earlier attempt restages cleanly
        merged.filter(col("day") === d).drop("day")
          .write.mode("overwrite").parquet(tmp.toString)
        // the replay marker rides INSIDE the swapped dir: data + marker
        // publish in one atomic rename ('_' files are reader-invisible)
        batchId.foreach(id => java.nio.file.Files.createFile(
          new java.io.File(tmp, s"_applied_$id").toPath))
        // rename-aside, never delete-first: pre-batch state survives a
        // crash at any point (the entry sweep restores or cleans it)
        val live = new java.io.File(dir, s"day=$d")
        val aside = new java.io.File(dir, s".old_day_$d")
        graft.Fs.rmTree(aside.toString)
        if (live.exists())
          java.nio.file.Files.move(live.toPath, aside.toPath)
        java.nio.file.Files.move(tmp.toPath, live.toPath)
        graft.Fs.rmTree(aside.toString)
      }
    } finally // free the maintenance checkpoint (persistent-RDD id delta)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
  }

  /** Heal swap leftovers from a crashed maintain (see swap discipline
    * above). Idempotent; runs at every maintain entry.
    */
  private def recoverSwaps(dir: String): Unit =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten.foreach { f =>
      val n = f.getName
      if (n.startsWith(".old_day_")) {
        val live = new java.io.File(dir, s"day=${n.stripPrefix(".old_day_")}")
        if (live.exists()) graft.Fs.rmTree(f.toString) // swap completed
        else java.nio.file.Files.move(f.toPath, live.toPath) // swap died mid-way
      } else if (n.startsWith(".tmp_day_")) graft.Fs.rmTree(f.toString)
    }

  /** Route a (groupDims, grain) aggregate to the rollup. Returns None
    * when the rollup cannot answer it (dims outside the cube or a grain
    * finer than day). The answer carries, per measure m: m_sum, m_min,
    * m_max and the derived m_avg — the half-up integer division
    * `(2·sum + n) div (2·n)` in the measure's own units, so an
    * oracle-checked consumer can cast it once instead of re-deriving
    * the exact form (requires non-negative sums, the same precondition
    * as everywhere the repo uses this formula: with a negative sum
    * Spark's truncating div and DuckDB's flooring // disagree) — plus
    * n_rows, all re-aggregated from the stored partials.
    */
  def answer(spark: SparkSession, dir: String, rollup: Rollup,
             groupDims: Seq[String], grain: String,
             dayRange: Option[(String, String)] = None): Option[DataFrame] = {
    if (!groupDims.forall(rollup.dims.contains)) return None
    val grainCol = grain match {
      case "day"   => to_date(col("day")).as("grain")
      case "week"  => date_trunc("week", to_date(col("day"))).cast("date").as("grain")
      case "month" => date_trunc("month", to_date(col("day"))).cast("date").as("grain")
      case _       => return None // finer than stored grain — not answerable
    }
    val stored = spark.read.parquet(dir)
    val ranged = dayRange.fold(stored) { case (lo, hi) =>
      stored.filter(col("day") >= lo && col("day") <= hi) // directory prune
    }
    val aggs = sum(col("n_rows")).as("n_rows") +:
      rollup.measures.flatMap(m => Seq(
        sum(col(s"${m}_sum")).as(s"${m}_sum"),
        min(col(s"${m}_min")).as(s"${m}_min"),
        max(col(s"${m}_max")).as(s"${m}_max")))
    val rolled = ranged
      .groupBy((groupDims.map(col) :+ grainCol): _*)
      .agg(aggs.head, aggs.tail: _*)
    // derived averages: half-up integer division — exact, oracle-safe
    val withAvg = rollup.measures.foldLeft(rolled) { (df, m) =>
      df.withColumn(s"${m}_avg",
        expr(s"(2 * ${m}_sum + n_rows) div (2 * n_rows)"))
    }
    Some(withAvg)
  }
}
