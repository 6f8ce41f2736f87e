package graft.streaming

import graft.operators.{AnnIndexStore, InvertedIndex, MergeInto}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming erasure: a queue of deletion requests (GDPR right-to-be-
  * forgotten tickets, takedowns) drives the corpus snapshot AND every
  * derived store that can serve the document back — the end-to-end
  * loop the per-store delete APIs exist for. One micro-batch of ids:
  *
  *   1. [[MergeInto.deleteWhere]] erases the snapshot rows (COW,
  *      one-rename commit, prior version = the audit window);
  *   2. [[InvertedIndex.delete]] tombstones the ids in the full-text
  *      index (unsearchable at commit; bytes drop at compact);
  *   3. [[AnnIndexStore.delete]] tombstones them in the ANN store
  *      (unreturnable at commit; bytes drop at purgeDeletes).
  *
  * Exactly-once EFFECT from foreachBatch's at-least-once delivery
  * WITHOUT batch markers: erasure is naturally convergent — all three
  * deletes are content-level no-ops for ids already erased (deleteWhere
  * matches no rows and returns without committing; the two tombstone
  * deletes drop already-tombstoned ids pre-commit and write NOTHING on
  * a clean replay), so a crash between stores just replays to the same
  * end state, and a replayed trigger commits no store version at all. Order matters only for the audit trail: the snapshot
  * erases first so a reader that still finds a doc via an index during
  * the window cannot join it back to live corpus bytes.
  *
  * Request ids the corpus never held are silently absorbed (erasure of
  * the absent is vacuously done) — the operational contract of a public
  * deletion queue. Scale: every step's cost tracks the REQUEST batch
  * (id-keyed anti-joins / tombstone files), never corpus or index size;
  * a day's physical reclaim (compact + purgeDeletes + vacuum) stays an
  * offline maintenance concern, exactly like every other store here.
  */
object EraseSink {

  /** Start the sink over a stream bearing a `doc_id` column of erasure
    * requests. `snapshotDir` must hold a MergeInto snapshot partitioned
    * by `partitionCol`; `indexDir`/`annDir` are optional (None = that
    * store is not maintained here). Vector ids are the document ids
    * (the repo-wide doc_id ≡ vec_id embedding contract).
    */
  def start(requests: DataFrame, snapshotDir: String, partitionCol: String,
            indexDir: Option[String], annDir: Option[String],
            checkpoint: String): StreamingQuery =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // the request batch is ticket-sized by nature; collect once so
          // the snapshot predicate and both tombstone frames agree even
          // if the source re-evaluates non-deterministically
          // null or malformed ids drop instead of killing the query
          // (try_cast, not ANSI cast) — a poisoned request must not
          // wedge the erasure queue forever on checkpoint replay
          // (review r11)
          val ids = batch.selectExpr("try_cast(doc_id AS LONG) AS doc_id")
            .filter(col("doc_id").isNotNull)
            .distinct().collect().map(_.getLong(0)).toSeq
          if (ids.nonEmpty) {
            MergeInto.deleteWhere(spark, snapshotDir,
              col("doc_id").isin(ids: _*), partitionCol)
            indexDir.foreach(d => InvertedIndex.delete(spark, d, ids))
            annDir.foreach(d => AnnIndexStore.delete(spark, d, ids))
          }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
