package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-dedup-at-ingest store: the seen-set that lets a
  * document stream drop re-crawled/replayed content BEFORE it costs
  * storage or a downstream pipeline pass — the ingest-side complement
  * of the corpus-side dedup family (exact groups, MinHash, SimHash,
  * SubstrDedup all dedupe what already landed; this stops it landing).
  *
  * Layout under one root, every byte resolved through a
  * [[StoreManifest]] (data files land first, ONE manifest rename is
  * the commit, vacuum sweeps unreferenced orphans):
  *
  *   - `docs/v<N>-part-*.parquet` — accepted documents (+ `fp`);
  *   - `seen/b=<k>/v<N>-part-*.parquet` — the fingerprint set,
  *     PARTITIONED by `b = pmod(xxhash64(fp), buckets)`.
  *
  * The fingerprint is `md5(text)` (128-bit — content equality for any
  * practical corpus; a paranoid deployment compares text on fp match).
  * md5 exists verbatim in DuckDB, which is what lets the accepted set
  * be HASH-GRADED against a from-scratch SQL dedup (s_dedup_stream_
  * ingest) instead of rows-only checked.
  *
  * ==Batch contract (the foreachBatch body, [[appendBatch]])==
  *
  *   1. ids `try_cast` to LONG, null ids/text dropped (a poisoned row
  *      from a PUBLIC queue must not wedge the checkpoint — r11);
  *   2. within-batch keep-first: min doc_id per fingerprint;
  *   3. survivors anti-join the COMMITTED seen-set — reading ONLY the
  *      `b=` bucket dirs the batch's fingerprints touch (driver-side
  *      file pruning off the manifest list, so a trickle batch reads
  *      ~batch × corpus/buckets seen rows, never the whole set);
  *   4. zero survivors → return WITHOUT committing (content-level
  *      no-op, exactly the property that makes checkpoint replay
  *      exactly-once in effect with no batch markers — the EraseSink
  *      doctrine); else stage docs + seen files and commit ONE new
  *      manifest referencing old + new.
  *
  * Crash anywhere before the manifest rename leaves only unreferenced
  * orphans (the replay restages under its own version-unique names;
  * [[vacuum]] sweeps). Cross-batch "first" is arrival order — the
  * contract any streaming keep-first has; a replay that REBATCHES
  * at-least-once deliveries keeps the accepted SET contract (a fp is
  * accepted exactly once) even if a different duplicate id could have
  * won under different boundaries.
  *
  * ==Near-duplicate mode (r13 — the VERDICT r12 headline gap)==
  *
  * Exact md5 lets a re-crawl with ONE changed sentence sail through.
  * With a [[NearConfig]] the store also keeps a MinHash-LSH band
  * seen-set — `near/pb=<k>/` rows (doc_id, band, bucket, sig),
  * partitioned by `pb = pmod(bucket, buckets)` — and a batch survivor
  * additionally drops when any of its band buckets collides with an
  * ACCEPTED doc's and the signatures agree on ≥ threshold of their
  * positions. The banding and the threshold expression are
  * [[MinHashDedup.banded]] / [[MinHashDedup.estJaccard]] — the SAME
  * text the batch operator evaluates, so the streamed survivor set
  * provably equals batch `nearDupPairs`-then-keep-first on the same
  * delivered batches (DedupSinkSpec). Within a batch the rule is the
  * batch operator's: drop `b` when a pair (a, b), a < b, meets the
  * threshold. Docs too short to shingle have no signature and are
  * exact-only — identical to the batch operator's domain.
  *
  * The config bakes at first commit (manifest `near` line) like the
  * bucket modulus; replay stays content-convergent (a replayed doc is
  * its own 1.0-jaccard near-dup of the committed copy — and the exact
  * fp probe already drops it before the near probe runs). Probe cost:
  * batch bands × (near rows / buckets) — the touched `pb=` dirs only,
  * same driver-side pruning as the exact probe. The signature rides in
  * EVERY band row (bands × sigBytes per accepted doc, ~8 KB at
  * 64 hashes × 16 bands): space traded for single-join probes — the
  * alternative (a separate sig table) re-reads corpus-wide per
  * trigger. At 100 TB, tune bands/numHashes down or raise `buckets`;
  * the probe stays bucket-local either way.
  *
  * ==Semantic mode (r13 — the third probe family)==
  *
  * With an [[EmbConfig]], survivors of the lexical gates also probe an
  * embedding seen-set — `embs/pb=pmod(xxhash64(table, bucket),
  * buckets)/` rows (doc_id, table_id, bucket, v, nrm) bucketed by the
  * batch operator's own hyperplane LSH ([[AnnLsh.buckets]], seeded
  * planes) — and drop on any bucket collision with an accepted doc at
  * exact cosine ≥ threshold ([[AnnLsh.cosineRaw]], the batch
  * operator's own comparison). This is the crawl case md5 AND MinHash
  * both miss: the same content re-encoded (translation, paraphrase,
  * template re-render) with a near-identical embedding. Null
  * embeddings are exempt (the no-signature analog); gates compose
  * exact → lexical → semantic, each family's seen-rows landing only
  * for the FINAL accepted set, and every maintenance path (delete,
  * compactSeen, vacuum) treats the three families uniformly.
  *
  * Single-writer per store root, like every sink here.
  */
object DedupStore {

  private val DefaultBuckets = 64

  /** Near-dup ingest configuration; bakes at the store's first commit.
    * Defaults mirror [[MinHashDedup.nearDupPairs]].
    */
  final case class NearConfig(numHashes: Int = 64, bands: Int = 16,
                              shingleSize: Int = 3, threshold: Double = 0.3) {
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    def rowsPerBand: Int = numHashes / bands
    def encode: String = s"$numHashes,$bands,$shingleSize,$threshold"
  }

  object NearConfig {
    def decode(s: String): NearConfig = s.split(',') match {
      case Array(nh, bd, sh, th) =>
        NearConfig(nh.toInt, bd.toInt, sh.toInt, th.toDouble)
      case _ => throw new IllegalStateException(s"malformed near config: $s")
    }
  }

  /** SEMANTIC near-dup ingest configuration (r13 — the third probe
    * family: exact md5, lexical MinHash, embedding cosine): a batch
    * survivor drops when it shares a random-hyperplane LSH bucket
    * ([[AnnLsh.buckets]] — the batch operator's own banding) with an
    * accepted doc in ANY table AND exact cosine ≥ threshold
    * ([[AnnLsh.cosineRaw]] — the batch operator's own comparison).
    * Requires batches to carry an `embedding` column (null = exempt
    * from this gate, like sig-less short docs in near mode). `dim`
    * fixes the plane geometry and bakes with the rest at first commit.
    * Defaults mirror [[AnnLsh.nearDupPairs]].
    */
  final case class EmbConfig(dim: Int, tables: Int = 16,
                             planesPerTable: Int = 5,
                             threshold: Double = 0.4, seed: Long = 42) {
    require(dim > 0 && tables > 0 && planesPerTable > 0 && planesPerTable <= 62,
      s"bad emb geometry: dim=$dim tables=$tables planes=$planesPerTable")
    require(threshold > -1 && threshold <= 1,
      s"cosine threshold must be in (-1, 1], got $threshold")
    def encode: String = s"$dim,$tables,$planesPerTable,$threshold,$seed"
  }

  object EmbConfig {
    def decode(s: String): EmbConfig = s.split(',') match {
      case Array(d, t, p, th, sd) =>
        EmbConfig(d.toInt, t.toInt, p.toInt, th.toDouble, sd.toLong)
      case _ => throw new IllegalStateException(s"malformed emb config: $s")
    }
  }

  /** Per-attempt gate accounting for one [[appendBatchStats]] call.
    * The waterfall is the gate order: batchRows → (clean + within-batch
    * keep-first + committed-fp probe) → exactFresh → (lexical gate) →
    * lexicalKept → (semantic gate) → accepted. `droppedExact` folds
    * invalid rows (null/unparseable ids, null text) with exact dups —
    * both leave at the first gate. These are ATTEMPT-scoped truths: a
    * replayed delivery legitimately reports its rows as droppedExact
    * (the store already has them) — exactly-once CUMULATIVE counts
    * must derive from the committed `ingest` manifest tags instead
    * ([[graft.streaming.IngestMetrics]]).
    */
  final case class AppendStats(batchRows: Long, exactFresh: Long,
                               lexicalKept: Long, accepted: Long,
                               version: Long) {
    def droppedExact: Long = batchRows - exactFresh
    def droppedLexical: Long = exactFresh - lexicalKept
    def droppedSemantic: Long = lexicalKept - accepted
  }

  /** Idempotent per-trigger core. `batch` needs `doc_id` and `text`;
    * every other column rides along into `docs/`. `near` arms the
    * lexical (MinHash) and `emb` the semantic (embedding-cosine)
    * near-dup seen-sets on the store's FIRST commit (store properties,
    * baked like `buckets` — later calls use the stored configs
    * regardless of the arguments). Returns the number of newly
    * accepted documents (0 = nothing committed).
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, dir: String,
                  buckets: Int = DefaultBuckets,
                  near: Option[NearConfig] = None,
                  emb: Option[EmbConfig] = None): Long =
    appendImpl(spark, batch, dir, buckets, near, emb, stats = false).accepted

  /** [[appendBatch]] with per-gate accounting (the observability hook —
    * VERDICT r13 #4). Costs up to three extra counts over batch-sized
    * (mostly checkpointed) frames; the store commits are identical.
    */
  def appendBatchStats(spark: SparkSession, batch: DataFrame, dir: String,
                       buckets: Int = DefaultBuckets,
                       near: Option[NearConfig] = None,
                       emb: Option[EmbConfig] = None): AppendStats =
    appendImpl(spark, batch, dir, buckets, near, emb, stats = true)

  private def appendImpl(spark: SparkSession, batch: DataFrame, dir: String,
                         buckets: Int,
                         near: Option[NearConfig],
                         emb: Option[EmbConfig], stats: Boolean): AppendStats = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val root = new Path(dir)
    val fs = StoreManifest.hfs(spark, root)
    fs.mkdirs(root)
    // counts run only on the stats path — the plain append pays no
    // extra jobs (batchRows is the one count over the RAW batch; the
    // others read checkpointed frames)
    val batchRows = if (stats) batch.count() else 0L
    val cur = StoreManifest.currentVersion(spark, dir)
    // the modulus is a STORE property, not a call-site default: first
    // commit bakes it, later appends use the baked value regardless of
    // the caller's argument (the r11 bucket-modulus lesson — a caller
    // default drifting from the store's poisons every later probe)
    val b = if (cur < 0) buckets else storedBuckets(spark, dir, cur)
    val others = batch.columns.filterNot(c => c == "doc_id" || c == "text")
    val clean = batch
      .select((expr("try_cast(doc_id AS LONG)").as("doc_id") +:
        col("text") +: others.map(col)): _*)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("fp", md5(col("text").cast("binary")))
    // within-batch keep-first (min id per fp): a fp-keyed min aggregate
    // + an equi semi-join back — batch-sized, hash-aggregated (no
    // window, no array buffers). Checkpointed ONCE: the touched-bucket
    // collect and the anti-join both read it, and each re-evaluation
    // would re-fingerprint the whole batch
    val firsts = clean.join(
        clean.groupBy("fp").agg(min("doc_id").as("doc_id")),
        Seq("fp", "doc_id"), "left_semi")
      .dropDuplicates("fp")
      .withColumn("b", pmod(xxhash64(col("fp")), lit(b)))
      .localCheckpoint()
    // committed-seen probe pruned to the TOUCHED buckets: bucket ids
    // are bounded by `buckets`, so this collect is coordinator-sized
    val touched = firsts.select("b").distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) // nothing survived the clean/keep-first
      return AppendStats(batchRows, 0L, 0L, 0L, -1L)
    val fresh = (if (cur < 0) firsts
      else {
        val seenFiles = fpFiles(spark, dir, cur)
          .filter(f => touched.contains(bucketOfPath(f)))
        if (seenFiles.isEmpty) firsts
        else {
          // seen side carries no stats (manifest-resolved file list) —
          // SHUFFLE_HASH keeps the planner from sorting both sides (r5);
          // both sides are already pruned: batch-sized vs touched dirs
          val seen = spark.read.schema(SeenSchema)
            .parquet(seenFiles.map(f => s"$dir/seen/$f"): _*)
          firsts.join(seen.hint("shuffle_hash"), Seq("fp"), "left_anti")
        }
      }).localCheckpoint()
    val nNew = fresh.count()
    if (nNew == 0L) // clean replay / all duplicates: no commit
      return AppendStats(batchRows, 0L, 0L, 0L, -1L)
    // ---- near-dup gates (object scaladoc): exact-fresh docs pass the
    // LEXICAL gate (MinHash band collision + signature agreement ≥
    // threshold vs an accepted or smaller-id batch doc), then the
    // SEMANTIC gate (hyperplane-LSH bucket collision + exact cosine ≥
    // threshold). Each probe reads only the pb= dirs the batch touches;
    // each family's seen-rows land only for the FINAL accepted set.
    val nearCfg = if (cur < 0) near else storedNear(spark, dir, cur)
    val embCfg = if (cur < 0) emb else storedEmb(spark, dir, cur)
    val (kept2, bandedKept) = nearCfg match {
      case None => (fresh, None)
      case Some(nc) =>
        // docs too short to shingle carry no signature: exact-only,
        // same as the batch operator's domain
        val sigs = MinHashDedup.signatures(fresh, "text", "doc_id",
          nc.numHashes, nc.shingleSize).localCheckpoint()
        val bd = MinHashDedup.banded(sigs, "doc_id", nc.bands, nc.rowsPerBand)
        // within-batch: the batch operator's rule — drop b of any
        // thresholded pair (a, b), a < b (candidatePairs' shape, minus
        // its per-call cache: sigs is already checkpointed)
        val aB = bd.select(col("doc_id").as("a_id"), col("sig").as("a_sig"),
          col("band"), col("bucket"))
        val bB = bd.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
          col("band").as("b_band"), col("bucket").as("b_bucket"))
        val batchDrops = aB.join(bB,
            col("band") === col("b_band") && col("bucket") === col("b_bucket") &&
              col("a_id") < col("b_id"))
          .filter(MinHashDedup.estJaccard("a_sig", "b_sig") >= nc.threshold)
          .select(col("b_id").as("doc_id")).distinct()
        val banded = MinHashDedup.banded(
            sigs.join(batchDrops, Seq("doc_id"), "left_anti"),
            "doc_id", nc.bands, nc.rowsPerBand)
          .withColumn("pb", pmod(col("bucket"), lit(b.toLong)))
          .localCheckpoint()
        val touchedNear = banded.select("pb").distinct()
          .collect().map(_.getLong(0)).toSet
        val nearSeen =
          if (cur < 0) Seq.empty[String]
          else nearFiles(spark, dir, cur)
            .filter(f => touchedNear.contains(bucketOfPath(f)))
        val storeDrops =
          if (nearSeen.isEmpty) None
          else Some(banded
            .join(spark.read.schema(NearSchema)
                .parquet(nearSeen.map(f => s"$dir/near/$f"): _*)
                .select(col("band").as("s_band"), col("bucket").as("s_bucket"),
                  col("sig").as("s_sig"))
                .hint("shuffle_hash"),
              col("band") === col("s_band") && col("bucket") === col("s_bucket"))
            .filter(MinHashDedup.estJaccard("sig", "s_sig") >= nc.threshold)
            .select("doc_id").distinct())
        val drops = storeDrops.fold(batchDrops)(batchDrops.unionByName(_))
          .localCheckpoint()
        val acc = fresh.join(drops.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val keep = banded
          .join(drops.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("band"), col("bucket"), col("sig"),
            col("pb").cast("long").as("pb"))
        (acc, Some(keep))
    }
    val (accepted, embKeep) = embCfg match {
      case None => (kept2, None)
      case Some(ec) =>
        require(kept2.columns.contains("embedding"),
          "emb mode needs an `embedding` column on the batch")
        graft.functions.VectorFunctions.register(spark)
        // null AND zero-norm embeddings are exempt from this gate (the
        // no-sig analog). The zero guard is load-bearing: nrm=0 makes
        // cosineRaw 0/0 = NaN, and Spark orders NaN ABOVE every double,
        // so NaN >= threshold is TRUE — and zero vectors collide in
        // every hyperplane bucket, so without the guard the second and
        // every later zero-embedding doc silently drops as a semantic
        // dup of the first (ADVICE r13). Mirrored in
        // [[AnnLsh.nearDupPairs]] so batch ≡ stream holds.
        val withV = kept2.filter(col("embedding").isNotNull)
          .select(col("doc_id"), col("embedding").as("v"))
          .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
          .filter(col("nrm") > 0)
        val withB = withV.join(
            AnnLsh.buckets(withV.select("doc_id", "v"), "doc_id", "v",
              ec.tables, ec.planesPerTable, ec.dim, ec.seed), "doc_id")
          .withColumn("pb",
            pmod(xxhash64(col("table_id"), col("bucket")), lit(b.toLong)))
          .localCheckpoint()
        // within-batch: the batch operator's rule (nearDupPairs' shape)
        val xa = withB.select(col("doc_id").as("a_id"), col("v").as("av"),
          col("nrm").as("an"), col("table_id"), col("bucket"))
        val xb = withB.select(col("doc_id").as("b_id"), col("v").as("bv"),
          col("nrm").as("bn"), col("table_id").as("b_t"), col("bucket").as("b_b"))
        val batchDrops = xa.join(xb,
            col("table_id") === col("b_t") && col("bucket") === col("b_b") &&
              col("a_id") < col("b_id"))
          .filter(AnnLsh.cosineRaw("av", "an", "bv", "bn") >= ec.threshold)
          .select(col("b_id").as("doc_id")).distinct()
        val keptB = withB.join(batchDrops, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val touchedEmb = keptB.select("pb").distinct()
          .collect().map(_.getLong(0)).toSet
        val embSeen =
          if (cur < 0) Seq.empty[String]
          else embFiles(spark, dir, cur)
            .filter(f => touchedEmb.contains(bucketOfPath(f)))
        val storeDrops =
          if (embSeen.isEmpty) None
          else Some(keptB
            .join(spark.read.schema(EmbSchema)
                .parquet(embSeen.map(f => s"$dir/embs/$f"): _*)
                .select(col("table_id").as("s_t"), col("bucket").as("s_b"),
                  col("v").as("s_v"), col("nrm").as("s_nrm"))
                .hint("shuffle_hash"),
              col("table_id") === col("s_t") && col("bucket") === col("s_b"))
            .filter(AnnLsh.cosineRaw("v", "nrm", "s_v", "s_nrm") >= ec.threshold)
            .select("doc_id").distinct())
        val drops = storeDrops.fold(batchDrops)(batchDrops.unionByName(_))
          .localCheckpoint()
        val acc = kept2.join(drops.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val keep = keptB
          .join(drops.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("table_id"), col("bucket"),
            col("v"), col("nrm"), col("pb").cast("long").as("pb"))
        (acc, Some(keep))
    }
    // lexical-kept count for the stats waterfall: kept2 is the near
    // gate's checkpointed survivor frame (== fresh when near is off)
    val nLex =
      if (!stats) 0L
      else if (nearCfg.isEmpty) nNew
      else kept2.count()
    val nAcc = if (nearCfg.isEmpty && embCfg.isEmpty) nNew else accepted.count()
    if (nAcc == 0L) // every exact-fresh doc was a near-dup
      return AppendStats(batchRows, nNew, nLex, 0L, -1L)
    // band rows land only for FINAL accepted docs — the emb gate may
    // have dropped lexical-gate survivors
    val nearKeep = bandedKept.map(bk =>
      if (embCfg.isEmpty) bk
      else bk.join(accepted.select("doc_id").hint("shuffle_hash"),
        Seq("doc_id"), "left_semi"))
    val next = cur + 1
    // bound the files a trigger lands: accepted is checkpointed and
    // batch-sized, so coalesce costs nothing — without it every trigger
    // writes shuffle-partition-many doc files and that many PER BUCKET
    // on the seen side (file-count bloat is the probe's read
    // amplification at scale)
    val docParts = math.max(1, math.min(32, (nAcc / 500000L).toInt + 1))
    val docFs = stageDocs(spark, root, accepted.drop("b").coalesce(docParts), next)
    // partition by a COPY (`pb`): partitionBy strips its column out of
    // the data files, and the probe schema wants `b` readable without a
    // basePath-aware directory parse. Repartitioned BY pb first → one
    // file per touched bucket per trigger.
    val fpFs = StoreManifest.stageAndMove(spark, new Path(root, "seen"),
      accepted.select(col("fp"), col("b").cast("long").as("b"),
        col("b").cast("long").as("pb"))
        .repartition(math.max(1, math.min(touched.size, 32)), col("pb")),
      "pb", Some(touched.map(_.toString)), next)
    val nearFs = nearKeep.fold(Seq.empty[String])(nk =>
      StoreManifest.stageAndMove(spark, new Path(root, "near"),
        nk.repartition(math.max(1, math.min(b, 32)), col("pb")),
        "pb", None, next))
    val embFs = embKeep.fold(Seq.empty[String])(ek =>
      StoreManifest.stageAndMove(spark, new Path(root, "embs"),
        ek.repartition(math.max(1, math.min(b, 32)), col("pb")),
        "pb", None, next))
    val (prevDocs, prevFps, prevNear, prevEmb) =
      if (cur < 0) (Seq.empty[String], Seq.empty[String],
        Seq.empty[String], Seq.empty[String])
      else (docFiles(spark, dir, cur), fpFiles(spark, dir, cur),
        nearFiles(spark, dir, cur), embFiles(spark, dir, cur))
    // the `ingest` tag marks THIS version as an acceptance commit —
    // downstream derivations (IngestPipeline's index catch-up) key off
    // it; maintenance versions (delete, compactSeen) carry no tag, so a
    // survivor REWRITE can never be mistaken for new content
    StoreManifest.commit(spark, dir, next,
      Seq(s"schema\t${accepted.drop("b").schema.json}", s"buckets\t$b") ++
        nearCfg.map(nc => s"near\t${nc.encode}").toSeq ++
        embCfg.map(ec => s"emb\t${ec.encode}").toSeq ++
        Seq(s"ingest\t$nAcc") ++
        (prevDocs ++ docFs).sorted.map("doc\t" + _) ++
        (prevFps ++ fpFs).sorted.map("fp\t" + _) ++
        (prevNear ++ nearFs).sorted.map("nearf\t" + _) ++
        (prevEmb ++ embFs).sorted.map("embf\t" + _))
    AppendStats(batchRows, nNew, nLex, nAcc, next)
  }

  /** The accepted corpus at the current version (manifest-resolved —
    * never enumerate the dirs, r7).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame = {
    val cur = StoreManifest.currentVersion(spark, dir)
    require(cur >= 0, s"no committed dedup store under $dir")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(StoreManifest.read(spark, dir, cur, "schema").head)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val files = docFiles(spark, dir, cur)
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.map(f => s"$dir/docs/$f"): _*)
  }

  /** The committed fingerprint set, optionally pruned to the buckets a
    * fingerprint frame touches (the membership-probe read path).
    */
  def readSeen(spark: SparkSession, dir: String,
               touched: Option[Set[Long]] = None): DataFrame = {
    val cur = StoreManifest.currentVersion(spark, dir)
    require(cur >= 0, s"no committed dedup store under $dir")
    val files = fpFiles(spark, dir, cur)
      .filter(f => touched.forall(_.contains(bucketOfPath(f))))
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], SeenSchema)
    else spark.read.schema(SeenSchema).parquet(files.map(f => s"$dir/seen/$f"): _*)
  }

  /** Committed probe-set files (exact fp + near bands) at the current
    * version — the compaction trigger's cheap manifest-line count, no
    * filesystem listing. Both families accrue one file per touched
    * bucket per trigger and both fold at [[compactSeen]], so one bound
    * covers the probe's whole fan-in.
    */
  def seenFileCount(spark: SparkSession, dir: String): Long = {
    val cur = StoreManifest.currentVersion(spark, dir)
    if (cur < 0) 0L
    else (fpFiles(spark, dir, cur).length + nearFiles(spark, dir, cur).length +
      embFiles(spark, dir, cur).length).toLong
  }

  /** Fold the seen-set down to ONE file per populated bucket behind the
    * usual manifest flip — the IndexSink-compact symmetry: a long-lived
    * stream lands one seen file per touched bucket per trigger, and
    * without folding, the membership probe's fan-in grows with stream
    * LIFETIME instead of corpus size. Docs files carry forward verbatim
    * (they are read at corpus-scan granularity, not probed per
    * trigger). Readers racing the fold resolve the pre-fold manifest;
    * vacuum sweeps the superseded files. Returns the new seen file
    * count.
    */
  def compactSeen(spark: SparkSession, dir: String): Long = {
    val cur = StoreManifest.currentVersion(spark, dir)
    require(cur >= 0, s"no committed dedup store under $dir")
    val b = storedBuckets(spark, dir, cur)
    val next = cur + 1
    val all = readSeen(spark, dir)
    val fpFs = StoreManifest.stageAndMove(spark, new Path(dir, "seen"),
      all.withColumn("pb", col("b"))
        .repartition(math.max(1, math.min(b, 32)), col("pb")),
      "pb", None, next)
    // the near band and emb bucket seen-sets fold the same way (pb
    // re-derives from the bucket columns — the same pmods that wrote them)
    val prevNear = nearFiles(spark, dir, cur)
    val nearFs =
      if (prevNear.isEmpty) Seq.empty[String]
      else StoreManifest.stageAndMove(spark, new Path(dir, "near"),
        spark.read.schema(NearSchema)
          .parquet(prevNear.map(f => s"$dir/near/$f"): _*)
          .withColumn("pb", pmod(col("bucket"), lit(b.toLong)))
          .repartition(math.max(1, math.min(b, 32)), col("pb")),
        "pb", None, next)
    val prevEmb = embFiles(spark, dir, cur)
    val embFs =
      if (prevEmb.isEmpty) Seq.empty[String]
      else StoreManifest.stageAndMove(spark, new Path(dir, "embs"),
        spark.read.schema(EmbSchema)
          .parquet(prevEmb.map(f => s"$dir/embs/$f"): _*)
          .withColumn("pb",
            pmod(xxhash64(col("table_id"), col("bucket")), lit(b.toLong)))
          .repartition(math.max(1, math.min(b, 32)), col("pb")),
        "pb", None, next)
    val schemaLine = StoreManifest.read(spark, dir, cur, "schema").head
    StoreManifest.commit(spark, dir, next,
      Seq(s"schema\t$schemaLine", s"buckets\t$b") ++
        storedNear(spark, dir, cur).map(nc => s"near\t${nc.encode}").toSeq ++
        storedEmb(spark, dir, cur).map(ec => s"emb\t${ec.encode}").toSeq ++
        docFiles(spark, dir, cur).sorted.map("doc\t" + _) ++
        fpFs.sorted.map("fp\t" + _) ++
        nearFs.sorted.map("nearf\t" + _) ++
        embFs.sorted.map("embf\t" + _))
    (fpFs.length + nearFs.length + embFs.length).toLong
  }

  /** Erase accepted documents by id: their rows leave `docs/` AND their
    * fingerprints leave `seen/` — both in one manifest flip (COW: only
    * the files holding a target row rewrite, under version-unique
    * names; untouched files carry forward by reference). Absent /
    * already-erased ids are content-level no-ops and a clean replay
    * commits NOTHING — the EraseSink convergence contract every delete
    * API here keeps.
    *
    * Semantics note (deliberately NOT rebuild-without): at ingest this
    * store DROPPED every later duplicate of the erased doc, so
    * rebuilding without the doc would have accepted one of them —
    * bytes this store never kept and cannot resurrect. Erasure here
    * means "content gone AND the fingerprint forgotten": the same
    * content is re-acceptable if it arrives again, which is exactly
    * the right-to-be-forgotten reading (blocking re-entry would itself
    * remember the erased content). Returns docs erased.
    */
  def delete(spark: SparkSession, dir: String, ids: Seq[Long]): Long = {
    val cur = StoreManifest.currentVersion(spark, dir)
    if (cur < 0 || ids.isEmpty) return 0L
    val root = new Path(dir)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(StoreManifest.read(spark, dir, cur, "schema").head)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val b = storedBuckets(spark, dir, cur)
    // which doc files hold a target row — file-granular COW, probed with
    // one id-pruned, column-pruned scan
    val hitRows = spark.read.schema(schema)
      .parquet(docFiles(spark, dir, cur).map(f => s"$dir/docs/$f"): _*)
      .select(input_file_name().as("f"), col("doc_id"), col("fp"))
      .filter(col("doc_id").isin(ids: _*))
      .collect()
    if (hitRows.isEmpty) return 0L // erased/absent already: no commit
    val hitDocFiles = hitRows.map(r => new Path(r.getString(0)).getName).toSet
    val goneFps = hitRows.map(_.getString(2)).toSet
    val hitBuckets = hitRows.map(r =>
      bucketOfFp(r.getString(2), b)).toSet
    val next = cur + 1
    // rewrite only the touched doc files, keeping survivors
    val keptDocs = docFiles(spark, dir, cur).filterNot(hitDocFiles.contains)
    val rewrittenDocs =
      if (hitDocFiles.isEmpty) Seq.empty[String]
      else {
        val survivors = spark.read.schema(schema)
          .parquet(hitDocFiles.toSeq.map(f => s"$dir/docs/$f"): _*)
          .filter(!col("doc_id").isin(ids: _*))
        if (survivors.isEmpty) Seq.empty[String]
        else stageDocs(spark, root, survivors, next)
      }
    // rewrite only the seen files in the hit buckets, dropping the
    // erased fingerprints
    val (hitFpFiles, keptFps) = fpFiles(spark, dir, cur)
      .partition(f => hitBuckets.contains(bucketOfPath(f)))
    val rewrittenFps =
      if (hitFpFiles.isEmpty) Seq.empty[String]
      else {
        val survivors = spark.read.schema(SeenSchema)
          .parquet(hitFpFiles.map(f => s"$dir/seen/$f"): _*)
          .filter(!col("fp").isin(goneFps.toSeq: _*))
          .withColumn("pb", col("b"))
        if (survivors.isEmpty) Seq.empty[String]
        else StoreManifest.stageAndMove(spark, new Path(root, "seen"),
          survivors, "pb", Some(hitBuckets.map(_.toString)), next)
      }
    // the erased docs' band signatures are derived content — they leave
    // too (the forget-and-allow-reentry semantics extends to near mode:
    // keeping the bands would silently block the content's re-entry).
    // Their pb dirs re-derive from the erased TEXT with the same banding
    // that wrote them, so the rewrite reads only the touched dirs, never
    // the whole near set. Short docs have no bands — nothing rewrites.
    val nearCfg = storedNear(spark, dir, cur)
    val prevNearFs = nearFiles(spark, dir, cur)
    val nearLines: Seq[String] = nearCfg match {
      case Some(nc) if prevNearFs.nonEmpty =>
        val erased = spark.read.schema(schema)
          .parquet(hitDocFiles.toSeq.map(f => s"$dir/docs/$f"): _*)
          .filter(col("doc_id").isin(ids: _*))
          .select("doc_id", "text")
        val erasedBands = MinHashDedup.banded(
            MinHashDedup.signatures(erased, "text", "doc_id",
              nc.numHashes, nc.shingleSize),
            "doc_id", nc.bands, nc.rowsPerBand)
          .withColumn("pb", pmod(col("bucket"), lit(b.toLong)))
        val hitNearPbs = erasedBands.select("pb").distinct()
          .collect().map(_.getLong(0)).toSet
        val (hitNearFs, keptNearFs) = prevNearFs
          .partition(f => hitNearPbs.contains(bucketOfPath(f)))
        val rewrittenNear =
          if (hitNearFs.isEmpty) Seq.empty[String]
          else {
            val nearSurvivors = spark.read.schema(NearSchema)
              .parquet(hitNearFs.map(f => s"$dir/near/$f"): _*)
              .filter(!col("doc_id").isin(ids: _*))
              .withColumn("pb", pmod(col("bucket"), lit(b.toLong)))
            if (nearSurvivors.isEmpty) Seq.empty[String]
            else StoreManifest.stageAndMove(spark, new Path(root, "near"),
              nearSurvivors, "pb", Some(hitNearPbs.map(_.toString)), next)
          }
        (keptNearFs ++ rewrittenNear).sorted.map("nearf\t" + _)
      case _ => prevNearFs.sorted.map("nearf\t" + _)
    }
    // the erased docs' embedding bucket rows leave too (same derived-
    // content doctrine as the bands); pb dirs re-derive from the stored
    // embedding column, so only touched dirs rewrite
    val embCfg = storedEmb(spark, dir, cur)
    val prevEmbFs = embFiles(spark, dir, cur)
    val embLines: Seq[String] = embCfg match {
      case Some(ec) if prevEmbFs.nonEmpty =>
        graft.functions.VectorFunctions.register(spark)
        // zero-norm vectors never landed emb rows (the gate's guard) —
        // same exemption here so the touched-pb set matches what wrote
        val erasedV = spark.read.schema(schema)
          .parquet(hitDocFiles.toSeq.map(f => s"$dir/docs/$f"): _*)
          .filter(col("doc_id").isin(ids: _*) && col("embedding").isNotNull &&
            expr("graft_dot(embedding, embedding)") > 0)
          .select(col("doc_id"), col("embedding").as("v"))
        val erasedB = AnnLsh.buckets(erasedV, "doc_id", "v",
            ec.tables, ec.planesPerTable, ec.dim, ec.seed)
          .withColumn("pb",
            pmod(xxhash64(col("table_id"), col("bucket")), lit(b.toLong)))
        val hitEmbPbs = erasedB.select("pb").distinct()
          .collect().map(_.getLong(0)).toSet
        val (hitEmbFs, keptEmbFs) = prevEmbFs
          .partition(f => hitEmbPbs.contains(bucketOfPath(f)))
        val rewrittenEmb =
          if (hitEmbFs.isEmpty) Seq.empty[String]
          else {
            val embSurvivors = spark.read.schema(EmbSchema)
              .parquet(hitEmbFs.map(f => s"$dir/embs/$f"): _*)
              .filter(!col("doc_id").isin(ids: _*))
              .withColumn("pb",
                pmod(xxhash64(col("table_id"), col("bucket")), lit(b.toLong)))
            if (embSurvivors.isEmpty) Seq.empty[String]
            else StoreManifest.stageAndMove(spark, new Path(root, "embs"),
              embSurvivors, "pb", Some(hitEmbPbs.map(_.toString)), next)
          }
        (keptEmbFs ++ rewrittenEmb).sorted.map("embf\t" + _)
      case _ => prevEmbFs.sorted.map("embf\t" + _)
    }
    StoreManifest.commit(spark, dir, next,
      Seq(s"schema\t${schema.json}", s"buckets\t$b") ++
        nearCfg.map(nc => s"near\t${nc.encode}").toSeq ++
        embCfg.map(ec => s"emb\t${ec.encode}").toSeq ++
        (keptDocs ++ rewrittenDocs).sorted.map("doc\t" + _) ++
        (keptFps ++ rewrittenFps).sorted.map("fp\t" + _) ++
        nearLines ++ embLines)
    // older versions still reference the pre-delete bytes until vacuum —
    // the same auditable-erasure window every COW store here keeps
    hitRows.map(_.getLong(1)).distinct.length.toLong
  }

  /** The writer's bucket of a fingerprint, computed on the driver —
    * the same Spark-default-seed xxhash64 the index's term buckets use.
    */
  private def bucketOfFp(fp: String, buckets: Int): Long =
    InvertedIndex.bucketOf(fp, buckets)

  /** Drop manifests beyond the newest `retain` and sweep every data
    * file no surviving version references (crash orphans, expired
    * history). `keepFrom` pins every version >= it regardless of the
    * count — the floor a DERIVING store sets so a version it has not
    * consumed yet cannot expire under it no matter how many maintenance
    * commits land in between ([[graft.streaming.IngestPipeline
    * .vacuumSafe]]; ADVICE r12). Returns files deleted.
    */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 2,
             keepFrom: Option[Long] = None): Long = {
    val root = new Path(dir)
    val fs = StoreManifest.hfs(spark, root)
    if (StoreManifest.currentVersion(spark, dir) < 0) return 0L
    // versions are ascending and expire keeps the NEWEST n, so keeping
    // max(retain, count >= keepFrom) retains the whole pinned suffix
    val all = StoreManifest.versions(spark, dir)
    val effRetain = keepFrom.fold(retain)(f => math.max(retain, all.count(_ >= f)))
    val keep = StoreManifest.expire(spark, dir, effRetain)
    val refDocs = keep.flatMap(v => docFiles(spark, dir, v)).toSet
    val refFps = keep.flatMap(v => fpFiles(spark, dir, v)).toSet
    val refNear = keep.flatMap(v => nearFiles(spark, dir, v)).toSet
    val refEmb = keep.flatMap(v => embFiles(spark, dir, v)).toSet
    var deleted = 0L
    fs.listStatus(root).filter(_.getPath.getName.startsWith(".merge-tmp"))
      .foreach(p => fs.delete(p.getPath, true))
    val docsDir = new Path(root, "docs")
    if (fs.exists(docsDir))
      fs.listStatus(docsDir).filter(_.isFile).foreach { f =>
        if (!refDocs.contains(f.getPath.getName)) {
          fs.delete(f.getPath, false); deleted += 1
        }
      }
    for ((sub, refs) <- Seq("seen" -> refFps, "near" -> refNear,
        "embs" -> refEmb)) {
      val d = new Path(root, sub)
      if (fs.exists(d))
        fs.listStatus(d).filter(_.isDirectory).foreach { bd =>
          fs.listStatus(bd.getPath).filter(_.isFile).foreach { f =>
            val rel = s"${bd.getPath.getName}/${f.getPath.getName}"
            if (!refs.contains(rel)) { fs.delete(f.getPath, false); deleted += 1 }
          }
          if (fs.listStatus(bd.getPath).isEmpty) fs.delete(bd.getPath, true)
        }
    }
    deleted
  }

  private val SeenSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fp",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("b",
      org.apache.spark.sql.types.LongType)))

  private def storedBuckets(spark: SparkSession, dir: String, v: Long): Int =
    StoreManifest.read(spark, dir, v, "buckets").head.toInt

  private def docFiles(spark: SparkSession, dir: String, v: Long): Seq[String] =
    StoreManifest.read(spark, dir, v, "doc")

  private def fpFiles(spark: SparkSession, dir: String, v: Long): Seq[String] =
    StoreManifest.read(spark, dir, v, "fp")

  private def nearFiles(spark: SparkSession, dir: String, v: Long): Seq[String] =
    StoreManifest.read(spark, dir, v, "nearf")

  private def storedNear(spark: SparkSession, dir: String,
                         v: Long): Option[NearConfig] =
    StoreManifest.read(spark, dir, v, "near").headOption.map(NearConfig.decode)

  private def embFiles(spark: SparkSession, dir: String, v: Long): Seq[String] =
    StoreManifest.read(spark, dir, v, "embf")

  private def storedEmb(spark: SparkSession, dir: String,
                        v: Long): Option[EmbConfig] =
    StoreManifest.read(spark, dir, v, "emb").headOption.map(EmbConfig.decode)

  private val EmbSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("table_id",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType)))

  private val NearSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sig",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))))

  /** `pb=<k>/v…parquet` → k. */
  private def bucketOfPath(rel: String): Long =
    rel.takeWhile(_ != '/').stripPrefix("pb=").toLong

  /** Stage `df` as parquet and move each part into `docs/` under a
    * version-unique name; returns the moved names. Until the caller's
    * manifest commit every moved file is an invisible orphan.
    */
  private def stageDocs(spark: SparkSession, root: Path, df: DataFrame,
                        next: Long): Seq[String] = {
    val fs = StoreManifest.hfs(spark, root)
    val tmp = new Path(root, s".merge-tmp-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(root, "docs")
    fs.mkdirs(dst)
    val moved = fs.listStatus(tmp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val name = s"v$next-${f.getPath.getName}"
        require(fs.rename(f.getPath, new Path(dst, name)),
          s"rename ${f.getPath} -> $dst/$name failed")
        name
      }.toSeq
    fs.delete(tmp, true)
    moved
  }
}
