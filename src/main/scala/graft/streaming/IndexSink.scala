package graft.streaming

import graft.operators.InvertedIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming inverted-index maintenance: a document stream keeps the
  * persisted [[InvertedIndex]] phrase-searchable fresh — the third of
  * the three stream-maintained stores (ANN index: [[AnnIndexSink]],
  * rollup cube: [[RollupSink]], full-text index: here), all the same
  * composition: foreachBatch + an idempotent atomic storage commit.
  *
  * Exactly-once EFFECT from at-least-once delivery: each trigger's
  * postings become ONE new segment (`seg=b<batchId>`), staged in a
  * reader-invisible tmp dir and published by a single rename —
  * [[InvertedIndex.append]] short-circuits if the segment already
  * exists, so a replayed trigger is a no-op and a crash mid-write
  * leaves only an invisible tmp the replay restages. Search-after-
  * stream ≡ batch rebuild of the same documents (InvertedIndexSpec).
  *
  * Scale shape per trigger: one batch-sized tokenize + aggregate and
  * ≤ `buckets` files — cost tracks the STREAM rate, not index size.
  * Segments accumulate one per trigger; fold them periodically with an
  * offline rebuild (write() to a fresh dir) the same way ANN re-trains:
  * compaction is an offline concern, not a sink concern.
  */
object IndexSink {

  /** Start the sink over a stream of (doc_id, text) rows; `dir` may
    * start empty or hold an index built by [[InvertedIndex.write]].
    */
  def start(docs: DataFrame, dir: String, checkpoint: String,
            buckets: Int = 32): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          InvertedIndex.append(batch, dir, s"b$batchId", buckets)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
