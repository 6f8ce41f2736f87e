package graft.streaming

import graft.operators.SpaceSaving
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One shard's current summary, re-emitted each micro-batch the shard
  * sees data; `ver` increments per emission so readers keep MAX(ver).
  */
case class TopKRow(shard: Long, ver: Long, item: Long, est_count: Long, max_err: Long)

/** Shard state: emission version + the Space-Saving counter table. */
case class TopKState(ver: Long, counters: Map[Long, (Long, Long)])

/** Streaming heavy hitters — the unbounded-stream twin of
  * `s_topk_spacesaving`, reusing the SAME SpaceSaving reduce/finish so
  * batch and stream cannot drift.
  *
  * Sharding: items hash to `nShards` state keys, each holding an
  * independent m-counter Space-Saving summary over ITS OWN item subset.
  * Because an item lives in exactly one shard, per-shard guarantees are
  * the full guarantees ([count−err, count] containment; exact counts
  * when a shard tracks ≤ m distinct items) — merging shard summaries is
  * a union, not a lossy sketch merge. State per shard is O(m) forever:
  * the structure an unbounded 100 TB/day stream needs, and parallelism =
  * nShards (pick ~#cores at production scale).
  *
  * Emission: Update mode, the shard's full summary each batch it changes;
  * a serving reader keeps the latest `ver` per shard (ServingSink's
  * snapshot-pointer pattern) and unions shards for the global top-k.
  */
object StreamingTopK {

  def perShardTopK(events: DataFrame, keyCol: String,
                   m: Int = 64, nShards: Int = 8): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    val ss = new SpaceSaving(m)
    events
      .select(col(keyCol).cast("long").as("item"),
        pmod(col(keyCol).cast("long"), lit(nShards.toLong)).as("shard"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(Long, Long)], state: GroupState[TopKState]) =>
          val prev = state.getOption.getOrElse(TopKState(0L, Map.empty))
          val buf = rows.foldLeft(prev.counters)((b, r) => ss.reduce(b, r._1))
          val ver = prev.ver + 1
          state.update(TopKState(ver, buf))
          ss.finish(buf).iterator.map { case (i, c, e) => TopKRow(shard, ver, i, c, e) }
      }
  }
}
