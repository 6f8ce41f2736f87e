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
  * Ordering constraint: [[DedupStore.vacuum]] must retain at least 2
  * versions (the default) so an un-indexed ingest version cannot
  * expire before the next trigger's catch-up — with catch-up running
  * every trigger, the index lags by at most the current trigger.
  *
  * Scale per trigger: the dedup probe reads the touched seen buckets
  * (batch × corpus/buckets); catch-up tokenizes only the NEW doc files
  * (batch-sized); segment count stays bounded by the IndexSink-style
  * auto-compact.
  */
object IngestPipeline {

  /** Start the composed sink over a stream bearing `doc_id` and `text`. */
  def start(docs: DataFrame, dedupDir: String, indexDir: String,
            checkpoint: String, buckets: Int = 64, idxBuckets: Int = 32,
            maxSeenFiles: Int = 256, maxSegments: Int = 8): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          DedupStore.appendBatch(spark, batch, dedupDir, buckets)
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
    * idempotent.
    */
  def indexCatchUp(spark: SparkSession, dedupDir: String, indexDir: String,
                   idxBuckets: Int = 32): Long = {
    if (StoreManifest.currentVersion(spark, dedupDir) < 0) return 0L
    val have = InvertedIndex.segments(spark, indexDir).toSet
    var appended = 0L
    for (v <- StoreManifest.versions(spark, dedupDir)
         if !have.contains(s"seg=dv$v")
         if StoreManifest.read(spark, dedupDir, v, "ingest").nonEmpty) {
      val newFiles = StoreManifest.read(spark, dedupDir, v, "doc")
        .filter(_.startsWith(s"v$v-"))
      if (newFiles.nonEmpty) {
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(StoreManifest.read(spark, dedupDir, v, "schema").head)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val docsV = spark.read.schema(schema)
          .parquet(newFiles.map(f => s"$dedupDir/docs/$f"): _*)
          .select("doc_id", "text")
        if (InvertedIndex.append(docsV, indexDir, s"dv$v", idxBuckets))
          appended += 1
      }
    }
    appended
  }
}
