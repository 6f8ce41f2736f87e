package graft.streaming

import graft.operators.{AnnIndexStore, DedupStore, InvertedIndex, StoreManifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** The ingest TOPOLOGY: a raw document stream → dedup-at-ingest
  * ([[DedupStore]]) → full-text index ([[InvertedIndex]]) → ANN store
  * ([[AnnIndexStore]], r13, when the stream carries embeddings) —
  * duplicates never reach either derived store, and all three stay
  * exactly-once under at-least-once replay WITHOUT any cross-store
  * transaction.
  *
  * The composition trick: every derived store reads the dedup store's
  * COMMITTED VERSIONS, never the in-flight batch. Driving appends off
  * the trigger's accepted frame would lose updates — a crash between
  * the dedup commit and a derived append replays into a no-op
  * appendBatch (every fingerprint already committed), so the accepted
  * docs would never reach the derived store. Instead each trigger runs
  * a catch-up per store: every retained dedup version carrying the
  * `ingest` manifest tag and no corresponding derived commit (index
  * segment `dv<version>`; ANN batch marker `b<version>`) appends now,
  * reading exactly the doc files that version added (its `v<version>-`
  * prefixed names). Maintenance versions (delete, compactSeen) carry no
  * tag, so a survivor rewrite can never be re-ingested as new content.
  * Every half is idempotent (dedup appendBatch is content-convergent;
  * index append short-circuits on a committed segment; ANN appendBatch
  * on its batch marker), so any crash point replays to the same end
  * state.
  *
  * Ordering constraint: [[DedupStore.vacuum]] must never expire an
  * ingest version a derived store has not committed yet — a retain
  * COUNT alone is not enough, because maintenance commits (compactSeen,
  * erasure deletes) also consume versions and can push a lagging
  * ingest version past any fixed window while the pipeline is crashed
  * (ADVICE r12). [[vacuumSafe]] is the pipeline's vacuum: it pins
  * every version from the oldest un-consumed ingest version forward
  * (across ALL derived stores — the `keepFrom` floor on
  * [[DedupStore.vacuum]]), so the catch-ups' source files survive any
  * crash length.
  *
  * Erasure interleaving (ADVICE r12 medium): a crash can land between
  * an ingest commit v and v's catch-up, and an [[EraseSink]] erase of
  * one of v's docs then commits to the dedup store but — deliberately
  * — tombstones nothing downstream (the id was never indexed; both
  * derived deletes refuse unknown ids). The replayed catch-ups
  * therefore re-derive v's survivors instead of trusting v's file
  * list ([[versionSurvivors]]): files the CURRENT manifest still
  * references are untouched by any delete and ingest whole; files it
  * no longer references were rewritten/dropped by an erasure, so their
  * docs ingest only if still in the current accepted set (matched on
  * (doc_id, fp)) and not re-accepted by a LATER ingest version (which
  * ingests them as its own) — without this, the erased doc would
  * resurrect into a derived store permanently, breaking the composed
  * erasure guarantee.
  *
  * Scale per trigger: the dedup probe reads the touched seen buckets
  * (batch × corpus/buckets); each catch-up reads only the NEW doc
  * files (batch-sized); segment count stays bounded by the
  * IndexSink-style auto-compact, list files by the cell-keyed append.
  */
object IngestPipeline {

  /** Start the composed sink over a stream bearing `doc_id` and `text`.
    * `near` arms the dedup store's MinHash-LSH near-dup rejection (the
    * r13 near mode) — near-dup re-crawls then never reach the derived
    * stores either, since they derive from accepted versions only.
    * `annDir` (r13) adds the ANN arm: the stream must then also carry
    * an `embedding` column (it rides along into `docs/`); the first
    * non-empty version trains the geometry, every version's vectors
    * append via [[AnnIndexStore.appendBatch]] keyed by the DEDUP
    * VERSION — so a pipeline-fed ANN store must not also be fed by an
    * independent [[AnnIndexSink]] (batch-id collision).
    */
  def start(docs: DataFrame, dedupDir: String, indexDir: String,
            checkpoint: String, buckets: Int = 64, idxBuckets: Int = 32,
            maxSeenFiles: Int = 256, maxSegments: Int = 8,
            near: Option[DedupStore.NearConfig] = None,
            annDir: Option[String] = None, annNlist: Int = 16,
            vacuumRetain: Int = 0,
            emb: Option[DedupStore.EmbConfig] = None,
            metricsDir: Option[String] = None): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stats =
          if (!batch.isEmpty) {
            // per-gate accounting runs only when somebody will read it
            val st =
              if (metricsDir.isDefined)
                DedupStore.appendBatchStats(spark, batch, dedupDir, buckets, near, emb)
              else DedupStore.AppendStats(0L, 0L, 0L,
                DedupStore.appendBatch(spark, batch, dedupDir, buckets, near, emb), -1L)
            if (DedupStore.seenFileCount(spark, dedupDir) > maxSeenFiles)
              DedupStore.compactSeen(spark, dedupDir)
            st
          } else DedupStore.AppendStats(0L, 0L, 0L, 0L, -1L)
        // AFTER the append so this trigger's version lands immediately;
        // also sweeps any version a prior crash left un-consumed
        indexCatchUp(spark, dedupDir, indexDir, idxBuckets)
        if (InvertedIndex.segments(spark, indexDir).size > maxSegments)
          InvertedIndex.compact(spark, indexDir, idxBuckets,
            targetSegs = math.max(1, maxSegments / 2))
        annDir.foreach(ad => annCatchUp(spark, dedupDir, ad, annNlist))
        // vacuumRetain > 0 bounds the dedup store's manifest/file growth
        // under an ENDLESS stream (each trigger commits versions; the
        // index bounds itself inside append) — always through the
        // catch-up floor, never a bare vacuum, and AFTER the catch-ups
        // so the common case retains nothing extra
        if (vacuumRetain > 0)
          vacuumSafe(spark, dedupDir, indexDir, vacuumRetain, annDir)
        // LAST: the lag fields must reflect this trigger's healed state
        // (the version-keyed records inside heal crash gaps themselves)
        metricsDir.foreach(md => IngestMetrics.record(spark, md, batchId,
          stats, dedupDir, indexDir, annDir))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Version v's surviving docs as the CURRENT manifest sees them (the
    * erasure-interleaving guard in the object scaladoc), with `cols`
    * selected. None = the version added no doc files. Both probe joins
    * are empty in the no-crash steady state; their sides carry no
    * stats — SHUFFLE_HASH (r5) — and are batch-scale.
    */
  private def versionSurvivors(spark: SparkSession, dedupDir: String, v: Long,
                               ingestVersions: Seq[Long],
                               curDocFiles: Set[String],
                               cols: Seq[String]): Option[DataFrame] = {
    val newFiles = StoreManifest.read(spark, dedupDir, v, "doc")
      .filter(_.startsWith(s"v$v-"))
    if (newFiles.isEmpty) return None
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(StoreManifest.read(spark, dedupDir, v, "schema").head)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    def read(fs: Seq[String]) = spark.read.schema(schema)
      .parquet(fs.map(f => s"$dedupDir/docs/$f"): _*)
    // files the current manifest still references are untouched by any
    // delete — the common case, ingested whole with no extra read
    val (live, rewritten) = newFiles.partition(curDocFiles.contains)
    val liveDocs =
      if (live.isEmpty) None else Some(read(live).select(cols.map(col): _*))
    // files the current manifest dropped were rewritten by an erasure:
    // keep only docs (a) still accepted NOW under the same (doc_id, fp)
    // — an erased doc, or one re-accepted with new content, drops here —
    // and (b) not re-accepted by a LATER ingest version (same id AND
    // content re-entering after erasure: that version's own catch-up
    // ingests it; ingesting both would double it)
    val reDocs =
      if (rewritten.isEmpty) None
      else {
        val accepted = DedupStore.readDocs(spark, dedupDir)
          .select("doc_id", "fp")
        val laterClaimed = ingestVersions.filter(_ > v).flatMap { w =>
          StoreManifest.read(spark, dedupDir, w, "doc")
            .filter(_.startsWith(s"v$w-"))
        }
        val base = read(rewritten)
          .join(accepted.hint("shuffle_hash"), Seq("doc_id", "fp"), "left_semi")
        val filtered =
          if (laterClaimed.isEmpty) base
          else base.join(
            spark.read.schema(schema)
              .parquet(laterClaimed.map(f => s"$dedupDir/docs/$f"): _*)
              .select("doc_id").hint("shuffle_hash"),
            Seq("doc_id"), "left_anti")
        Some(filtered.select(cols.map(col): _*))
      }
    Some((liveDocs.toSeq ++ reDocs.toSeq).reduce(_ unionByName _))
  }

  private[streaming] def ingestVersionsOf(spark: SparkSession, dedupDir: String): Seq[Long] =
    StoreManifest.versions(spark, dedupDir)
      .filter(v => StoreManifest.read(spark, dedupDir, v, "ingest").nonEmpty)

  /** The max dedup version whose `dv` segment the index has consumed —
    * needed because COMPACTION FOLDS SEGMENT NAMES AWAY: once
    * [[InvertedIndex.compact]] merges `dv<v>` into a `c<i>` segment,
    * "is seg=dv<v> live" stops answering "was v indexed", and without
    * this mark the catch-up would re-index every folded version
    * (duplicate postings) and [[vacuumSafe]] would pin forever (found
    * by VacuumSpec, r13). Catch-up processes versions ASCENDING and
    * never skips one, so `v <= highWater` is exactly "done". Raised
    * (atomic tmp+rename) immediately after each version commits — a
    * crash before the raise is covered by the still-live segment name;
    * the name is only foldable after the next catch-up, which runs
    * before any pipeline compaction, re-raises the mark. (Corollary:
    * compact a pipeline-fed index only through the pipeline trigger or
    * after a catch-up.)
    */
  private val DvHighWater = "_graft_dv_highwater"
  private val DvMarkRe = """v(\d+)""".r

  /** The mark is a DIRECTORY of `v<N>` files and the max wins — a raise
    * CREATES a new name (one rename, nothing overwritten or deleted
    * first), then sweeps older entries; a crash at any point leaves
    * either the old max or both (harmless). A delete-then-rename single
    * file would have a lost-mark crash window, and a lost mark after a
    * compaction folded the dv names would re-index those versions.
    * Legacy note: an index built before the mark existed adopts at its
    * next catch-up via the still-live dv names; if such an index was
    * ALREADY compacted, folded versions are indistinguishable from
    * unconsumed ones — seed the mark (one `v<N>` file) or rebuild.
    */
  private[streaming] def dvHighWater(spark: SparkSession, indexDir: String): Long = {
    val d = new Path(indexDir, DvHighWater)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) -1L
    else fs.listStatus(d).map(_.getPath.getName)
      .collect { case DvMarkRe(n) => n.toLong }
      .foldLeft(-1L)(math.max)
  }

  private def raiseDvHighWater(spark: SparkSession, indexDir: String,
                               v: Long): Unit = {
    val d = new Path(indexDir, DvHighWater)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dvHighWater(spark, indexDir) >= v) return
    fs.mkdirs(d)
    val tmp = new Path(d, s".v$v-${java.util.UUID.randomUUID()}.tmp")
    fs.create(tmp, true).close()
    require(fs.rename(tmp, new Path(d, s"v$v")), s"highwater raise to $v failed")
    // sweep superseded marks (and crash-orphaned dot-tmps — single
    // writer, so any tmp left is a dead earlier attempt) AFTER the new
    // max landed
    fs.listStatus(d).map(_.getPath.getName).foreach {
      case DvMarkRe(n) if n.toLong < v => fs.delete(new Path(d, s"v$n"), false)
      case t if t.startsWith(".") => fs.delete(new Path(d, t), false)
      case _ => ()
    }
  }

  /** Index every retained ingest version the index has not committed
    * yet (past the [[DvHighWater]] mark, segment `dv<version>`);
    * returns the segments appended. Safe to call at any time — the
    * version scan and the append are idempotent. An all-erased lagging
    * version still commits its (empty) `dv<v>` segment so it stops
    * lagging and stops pinning [[vacuumSafe]].
    */
  def indexCatchUp(spark: SparkSession, dedupDir: String, indexDir: String,
                   idxBuckets: Int = 32): Long = {
    val cur = StoreManifest.currentVersion(spark, dedupDir)
    if (cur < 0) return 0L
    val have = InvertedIndex.segments(spark, indexDir).toSet
    val curDocFiles = StoreManifest.read(spark, dedupDir, cur, "doc").toSet
    val ingestVersions = ingestVersionsOf(spark, dedupDir)
    val hw = dvHighWater(spark, indexDir)
    var appended = 0L
    for (v <- ingestVersions if v > hw) {
      if (!have.contains(s"seg=dv$v"))
        versionSurvivors(spark, dedupDir, v, ingestVersions,
            curDocFiles, Seq("doc_id", "text")).foreach { docsV =>
          if (InvertedIndex.append(docsV, indexDir, s"dv$v", idxBuckets))
            appended += 1
        }
      raiseDvHighWater(spark, indexDir, v)
    }
    appended
  }

  /** ANN-index every retained ingest version the ANN store has not
    * committed yet (batch marker `b<version>`); returns versions
    * appended. The FIRST version with any vectors trains the geometry
    * ([[AnnIndexStore.train]] — centroids commit via parquet's own
    * `_SUCCESS`, so a torn train re-runs); ALL data, including the
    * training version's, then flows through the marker-idempotent
    * [[AnnIndexStore.appendBatch]] keyed by the dedup version. A
    * version with no vectors (or whose docs were all erased) commits a
    * bare marker so it stops lagging. Rows with a null `embedding`
    * land in the other stores but not here.
    */
  def annCatchUp(spark: SparkSession, dedupDir: String, annDir: String,
                 nlist: Int = 16): Long = {
    val cur = StoreManifest.currentVersion(spark, dedupDir)
    if (cur < 0) return 0L
    val fs = new Path(annDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val curDocFiles = StoreManifest.read(spark, dedupDir, cur, "doc").toSet
    val ingestVersions = ingestVersionsOf(spark, dedupDir)
    var appended = 0L
    for (v <- ingestVersions
         if !fs.exists(new Path(annDir, s"_ann_commits/b$v"))) {
      // legacy adoption (ADVICE r13): a version ingested before the ANN
      // arm was armed may have a pinned schema with NO `embedding`
      // column — selecting it would throw on EVERY trigger (a crash
      // loop with no remediation). Such a version is vector-less by
      // definition: commit its bare marker below like an empty one.
      val hasEmbCol = org.apache.spark.sql.types.DataType
        .fromJson(StoreManifest.read(spark, dedupDir, v, "schema").head)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.contains("embedding")
      val vecs =
        if (!hasEmbCol) None
        else versionSurvivors(spark, dedupDir, v, ingestVersions,
            curDocFiles, Seq("doc_id", "embedding"))
          .map(_.filter(col("embedding").isNotNull)
            .select(col("doc_id").as("vec_id"), col("embedding"))
            .localCheckpoint()) // read once: bootstrap probe + train + append
      val hasVecs = vecs.exists(!_.isEmpty)
      if (!AnnIndexStore.trained(spark, annDir) && hasVecs)
        AnnIndexStore.train(spark, vecs.get, annDir, nlist)
      if (AnnIndexStore.trained(spark, annDir) && hasVecs)
        AnnIndexStore.appendBatch(spark, vecs.get, annDir, v)
      else {
        // nothing to index (and nothing to train on): a bare marker —
        // same commit point appendBatch uses — ends the lag
        val marker = new Path(annDir, s"_ann_commits/b$v")
        fs.mkdirs(marker.getParent)
        fs.create(marker, true).close()
      }
      appended += 1
    }
    appended
  }

  /** The oldest ingest-tagged dedup version some derived store has NOT
    * committed yet (None = fully caught up) — the floor [[vacuumSafe]]
    * pins.
    */
  def oldestLagging(spark: SparkSession, dedupDir: String, indexDir: String,
                    annDir: Option[String] = None): Option[Long] =
    oldestLagging(spark, dedupDir, Some(indexDir), annDir)

  /** [[oldestLagging]] for any combination of derived arms — an
    * index-less pipeline (dedup + ANN only) still needs its floor:
    * without it a dedup vacuum can expire ingest versions the ANN arm
    * has not consumed, exactly the silent-data-loss mode the floor
    * exists to prevent (ADVICE r13).
    */
  def oldestLagging(spark: SparkSession, dedupDir: String,
                    indexDir: Option[String],
                    annDir: Option[String]): Option[Long] = {
    if (StoreManifest.currentVersion(spark, dedupDir) < 0) return None
    val have = indexDir.fold(Set.empty[String])(d =>
      InvertedIndex.segments(spark, d).toSet)
    val hw = indexDir.fold(Long.MaxValue)(d => dvHighWater(spark, d))
    val fs = annDir.map(ad =>
      new Path(ad).getFileSystem(spark.sparkContext.hadoopConfiguration))
    StoreManifest.versions(spark, dedupDir)
      .filter(v => StoreManifest.read(spark, dedupDir, v, "ingest").nonEmpty)
      .find(v => indexDir.exists(_ => v > hw && !have.contains(s"seg=dv$v")) ||
        annDir.exists(ad =>
          !fs.get.exists(new Path(ad, s"_ann_commits/b$v"))))
  }

  /** Vacuum the dedup store WITHOUT ever expiring a version an
    * un-consumed ingest version's catch-up still needs: every version
    * from the oldest lagging ingest version forward survives — across
    * the index AND the ANN arm — regardless of how many maintenance
    * commits (compactSeen, erasure deletes) landed after it while the
    * pipeline was down (ADVICE r12). Use this — never a bare
    * [[DedupStore.vacuum]] — on a pipeline-fed store. Returns files
    * deleted.
    */
  def vacuumSafe(spark: SparkSession, dedupDir: String, indexDir: String,
                 retain: Int = 2, annDir: Option[String] = None): Long = {
    val swept = DedupStore.vacuum(spark, dedupDir, retain,
      keepFrom = oldestLagging(spark, dedupDir, indexDir, annDir))
    swept + annDir.fold(0L)(ad => sweepAnnMarkers(spark, dedupDir, ad))
  }

  /** Retire `_ann_commits/b<v>` batch markers for ingest versions the
    * dedup store no longer retains — without this sweep the marker dir
    * grows one file per ingest version for the stream's LIFETIME
    * (ADVICE r13), quietly contradicting the disk-bounded retention
    * story. Safe by construction: [[annCatchUp]] consults markers only
    * for RETAINED ingest versions (it iterates the surviving
    * manifests), so a marker below the oldest retained version can
    * never be read again. Purge-generation markers (`p<g>`) are a
    * different namespace and never swept. Returns markers deleted.
    */
  def sweepAnnMarkers(spark: SparkSession, dedupDir: String,
                      annDir: String): Long = {
    val retained = ingestVersionsOf(spark, dedupDir)
    if (retained.isEmpty) return 0L // adopt nothing: no retained floor to judge by
    val floor = retained.min
    val commits = new Path(annDir, "_ann_commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) return 0L
    val BMark = """b(\d+)""".r
    val stale = fs.listStatus(commits).map(_.getPath.getName).collect {
      case n @ BMark(v) if v.toLong < floor => n
    }
    stale.foreach(n => fs.delete(new Path(commits, n), false))
    stale.length.toLong
  }
}
