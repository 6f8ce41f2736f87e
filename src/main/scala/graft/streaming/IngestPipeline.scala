package graft.streaming

import graft.operators.{DedupStore, InvertedIndex, StoreManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The ingest TOPOLOGY: a raw document stream → dedup-at-ingest
  * ([[DedupStore]]) → full-text index ([[InvertedIndex]]) — duplicates
  * never reach the index, and both stores stay exactly-once under
  * at-least-once replay WITHOUT any cross-store transaction.
  *
  * The composition trick: the index is derived from the dedup store's
  * COMMITTED VERSIONS, never from the in-flight batch. Driving
  * `InvertedIndex.append` off the trigger's accepted frame would lose
  * updates — a crash between the dedup commit and the index append
  * replays into a no-op appendBatch (every fingerprint already
  * committed), so the accepted docs would never reach the index.
  * Instead each trigger runs [[indexCatchUp]]: every retained dedup
  * version carrying the `ingest` manifest tag and no corresponding
  * index segment (`dv<version>`) appends now, reading exactly the doc
  * files that version added (its `v<version>-` prefixed names).
  * Maintenance versions (delete, compactSeen) carry no tag, so a
  * survivor rewrite can never be re-indexed as new content. Both
  * halves are idempotent (appendBatch is content-convergent; append
  * short-circuits on a committed segment), so any crash point replays
  * to the same end state.
  *
  * Ordering constraint: [[DedupStore.vacuum]] must never expire an
  * ingest version the index has not committed yet — a retain COUNT
  * alone is not enough, because maintenance commits (compactSeen,
  * erasure deletes) also consume versions and can push a lagging
  * ingest version past any fixed window while the pipeline is crashed
  * (ADVICE r12). [[vacuumSafe]] is the pipeline's vacuum: it pins
  * every version from the oldest un-indexed ingest version forward
  * (the `keepFrom` floor on [[DedupStore.vacuum]]), so the catch-up's
  * source files survive any crash length.
  *
  * Erasure interleaving (ADVICE r12 medium): a crash can land between
  * an ingest commit v and v's catch-up, and an [[EraseSink]] erase of
  * one of v's docs then commits to the dedup store but — deliberately
  * — tombstones nothing in the index (the id was never indexed). The
  * replayed catch-up therefore re-derives v's survivors instead of
  * trusting v's file list: files the CURRENT manifest still references
  * are untouched by any delete and index whole; files it no longer
  * references were rewritten/dropped by an erasure, so their docs
  * index only if still in the current accepted set (matched on
  * (doc_id, fp)) and not re-accepted by a LATER ingest version (which
  * indexes them as its own) — without this, the erased doc would
  * resurrect into the index permanently, breaking the composed erasure
  * guarantee.
  *
  * Scale per trigger: the dedup probe reads the touched seen buckets
  * (batch × corpus/buckets); catch-up tokenizes only the NEW doc files
  * (batch-sized); segment count stays bounded by the IndexSink-style
  * auto-compact.
  */
object IngestPipeline {

  /** Start the composed sink over a stream bearing `doc_id` and `text`.
    * `near` arms the dedup store's MinHash-LSH near-dup rejection (the
    * r13 near mode) — near-dup re-crawls then never reach the index
    * either, since the index derives from accepted versions only.
    */
  def start(docs: DataFrame, dedupDir: String, indexDir: String,
            checkpoint: String, buckets: Int = 64, idxBuckets: Int = 32,
            maxSeenFiles: Int = 256, maxSegments: Int = 8,
            near: Option[DedupStore.NearConfig] = None): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          DedupStore.appendBatch(spark, batch, dedupDir, buckets, near)
          if (DedupStore.seenFileCount(spark, dedupDir) > maxSeenFiles)
            DedupStore.compactSeen(spark, dedupDir)
        }
        // AFTER the append so this trigger's version indexes immediately;
        // also sweeps any version a prior crash left un-indexed
        indexCatchUp(spark, dedupDir, indexDir, idxBuckets)
        if (InvertedIndex.segments(spark, indexDir).size > maxSegments)
          InvertedIndex.compact(spark, indexDir, idxBuckets,
            targetSegs = math.max(1, maxSegments / 2))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Index every retained ingest version the index has not committed
    * yet (segment `dv<version>`); returns the segments appended. Safe
    * to call at any time — both the version scan and the append are
    * idempotent. Survivors re-derive against the CURRENT manifest (the
    * erasure-interleaving guard in the object scaladoc): an all-erased
    * lagging version still commits its (empty) `dv<v>` segment so it
    * stops lagging and stops pinning [[vacuumSafe]].
    */
  def indexCatchUp(spark: SparkSession, dedupDir: String, indexDir: String,
                   idxBuckets: Int = 32): Long = {
    val cur = StoreManifest.currentVersion(spark, dedupDir)
    if (cur < 0) return 0L
    val have = InvertedIndex.segments(spark, indexDir).toSet
    val curDocFiles = StoreManifest.read(spark, dedupDir, cur, "doc").toSet
    val allVersions = StoreManifest.versions(spark, dedupDir)
    val ingestVersions = allVersions
      .filter(v => StoreManifest.read(spark, dedupDir, v, "ingest").nonEmpty)
    var appended = 0L
    for (v <- ingestVersions if !have.contains(s"seg=dv$v")) {
      val newFiles = StoreManifest.read(spark, dedupDir, v, "doc")
        .filter(_.startsWith(s"v$v-"))
      if (newFiles.nonEmpty) {
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(StoreManifest.read(spark, dedupDir, v, "schema").head)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        def read(fs: Seq[String]) = spark.read.schema(schema)
          .parquet(fs.map(f => s"$dedupDir/docs/$f"): _*)
        // files the current manifest still references are untouched by
        // any delete — the common case, indexed whole with no extra read
        val (live, rewritten) = newFiles.partition(curDocFiles.contains)
        val liveDocs =
          if (live.isEmpty) None else Some(read(live).select("doc_id", "text"))
        // files the current manifest dropped were rewritten by an
        // erasure: keep only docs (a) still accepted NOW under the same
        // (doc_id, fp) — an erased doc, or one re-accepted with new
        // content, drops here — and (b) not re-accepted by a LATER
        // ingest version (same id AND content re-entering after erasure:
        // that version's own catch-up indexes it; indexing both would
        // double the postings). Both probes are empty in the no-crash
        // steady state. The semi-join side has no stats — SHUFFLE_HASH
        // (r5); both sides are batch-scale.
        val reDocs =
          if (rewritten.isEmpty) None
          else {
            val accepted = DedupStore.readDocs(spark, dedupDir)
              .select("doc_id", "fp")
            val laterClaimed = ingestVersions.filter(_ > v).flatMap { w =>
              StoreManifest.read(spark, dedupDir, w, "doc")
                .filter(_.startsWith(s"v$w-"))
            }
            val base = read(rewritten).select("doc_id", "text", "fp")
              .join(accepted.hint("shuffle_hash"), Seq("doc_id", "fp"), "left_semi")
            val filtered =
              if (laterClaimed.isEmpty) base
              else base.join(
                spark.read.schema(schema)
                  .parquet(laterClaimed.map(f => s"$dedupDir/docs/$f"): _*)
                  .select("doc_id").hint("shuffle_hash"),
                Seq("doc_id"), "left_anti")
            Some(filtered.select("doc_id", "text"))
          }
        val docsV = (liveDocs.toSeq ++ reDocs.toSeq).reduce(_ unionByName _)
        if (InvertedIndex.append(docsV, indexDir, s"dv$v", idxBuckets))
          appended += 1
      }
    }
    appended
  }

  /** The oldest ingest-tagged dedup version the index has NOT committed
    * yet (None = fully caught up) — the floor [[vacuumSafe]] pins.
    */
  def oldestLagging(spark: SparkSession, dedupDir: String,
                    indexDir: String): Option[Long] = {
    if (StoreManifest.currentVersion(spark, dedupDir) < 0) return None
    val have = InvertedIndex.segments(spark, indexDir).toSet
    StoreManifest.versions(spark, dedupDir)
      .filter(v => StoreManifest.read(spark, dedupDir, v, "ingest").nonEmpty)
      .find(v => !have.contains(s"seg=dv$v"))
  }

  /** Vacuum the dedup store WITHOUT ever expiring a version an
    * un-indexed ingest version's catch-up still needs: every version
    * from the oldest lagging ingest version forward survives,
    * regardless of how many maintenance commits (compactSeen, erasure
    * deletes) landed after it while the pipeline was down (ADVICE r12).
    * Use this — never a bare [[DedupStore.vacuum]] — on a pipeline-fed
    * store. Returns files deleted.
    */
  def vacuumSafe(spark: SparkSession, dedupDir: String, indexDir: String,
                 retain: Int = 2): Long =
    DedupStore.vacuum(spark, dedupDir, retain,
      keepFrom = oldestLagging(spark, dedupDir, indexDir))
}
