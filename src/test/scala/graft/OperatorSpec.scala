package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Unit + error-bound tests for the Spark-only operators (SURVEY.md
  * §5.3.1/§5.3.4): MinHash recall vs exact Jaccard, SimHash behavior on
  * near-identical docs, ANN-LSH recall vs exact cosine top-k, multimodal
  * featurize shape, sketch error bounds.
  */
class OperatorSpec extends SparkSpec {

  test("wav decode: sine RMS and zero-crossing rate, chunk walking, fallback") {
    // 1-channel 16-bit PCM, 8000 Hz, 0.1 s of a 400 Hz sine at 0.5 FS
    val sr = 8000; val n = 800; val freq = 400.0; val amp = 0.5
    val data = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (amp * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt
      data(i * 2) = (v & 0xff).toByte; data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    def le16(v: Int) = Array(v, v >> 8).map(x => (x & 0xff).toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(sr) ++
      le32(sr * 2) ++ le16(2) ++ le16(16)
    // a LIST chunk before data proves the walker skips unknown chunks
    val list = "LIST".getBytes ++ le32(4) ++ "INFO".getBytes
    val dataCk = "data".getBytes ++ le32(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ list ++ dataCk
    val wav = "RIFF".getBytes ++ le32(body.length) ++ body
    val f = graft.operators.Multimodal.decodeWav(wav).get
    assert(math.abs(f(0) - amp / math.sqrt(2)) < 0.01, s"RMS ${f(0)}")
    // 400 Hz over 0.1 s = 40 periods = ~80 zero crossings over 799 steps
    assert(math.abs(f(1) - 80.0 / 799) < 0.01, s"ZCR ${f(1)}")
    assert(math.abs(f(3) - amp) < 0.01, s"peak ${f(3)}")
    // envelope: steady sine, every segment RMS near the global RMS
    (4 until 16).foreach(k => assert(math.abs(f(k) - f(0)) < 0.05, s"seg $k ${f(k)}"))
    // a truncated data chunk: the own parser refuses (declared length
    // exceeds the buffer), but the dispatch now SALVAGES the readable
    // PCM prefix through the javax.sound fallback (r14) — real features
    // of the same steady sine, not stub garbage
    val bad = wav.take(wav.length - 100)
    assert(graft.operators.Multimodal.decodeWav(bad).isEmpty,
      "the strict parser must still refuse a truncated data chunk")
    val salvaged = graft.operators.Multimodal.decode(bad, "wav")
    assert(math.abs(salvaged(0) - amp / math.sqrt(2)) < 0.01,
      s"salvaged RMS ${salvaged(0)}")
    // genuinely unparseable bytes still degrade to the stub
    val garbage = Array.tabulate[Byte](64)(i => (i * 29).toByte)
    assert(graft.operators.Multimodal.decode(garbage, "wav").toSeq ==
      graft.operators.Multimodal.decodeStub(garbage).toSeq)
    // hostile chunk lengths must yield None (never hang or walk
    // backwards): 0xFFFFFFF8 truncated to Int was a ZERO advance —
    // an executor-task infinite loop — and 0xFFFFFFF0 walked pos
    // backwards out of the buffer
    for (evil <- Seq(0xFFFFFFF8, 0xFFFFFFF0, 0x7FFFFFFF)) {
      val hostile = "RIFF".getBytes ++ le32(body.length) ++ "WAVE".getBytes ++
        "JUNK".getBytes ++ le32(evil) ++ fmt ++ dataCk
      assert(graft.operators.Multimodal.decodeWav(hostile).isEmpty,
        f"chunk len 0x$evil%08x must be rejected")
    }
  }

  test("ppm decode: real pixels through the featurize stage, stub fallback for the rest") {
    import spark.implicits._
    // 4x2 P6: row 0 = pure red, green, blue, white; row 1 = black x4
    val header = "P6\n# test\n4 2\n255\n".getBytes("US-ASCII")
    val px = Array(
      255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 255,
      0, 0, 0,     0, 0, 0,     0, 0, 0,     0, 0, 0).map(_.toByte)
    val ppm = header ++ px
    val f = graft.operators.Multimodal.decodePpm(ppm).get
    // channel means: R = (255+255)/8/255, G = (255+255)/8/255, B likewise
    assert(math.abs(f(0) - 2.0f / 8) < 1e-6, s"mean R ${f(0)}")
    assert(math.abs(f(1) - 2.0f / 8) < 1e-6, s"mean G ${f(1)}")
    assert(math.abs(f(2) - 2.0f / 8) < 1e-6, s"mean B ${f(2)}")
    // luminance histogram fractions sum to 1
    assert(math.abs((5 until 16).map(f(_)).sum - 1.0f) < 1e-5)
    // black pixels + pure blue (lum 29) land in bin 0 and 1: 5 of 8 low
    assert(f(5) + f(6) >= 5.0f / 8 - 1e-5)
    // malformed ppm (truncated pixels) falls back to the stub, not a crash
    val bad = header ++ px.take(5)
    val viaDecode = graft.operators.Multimodal.decode(bad, "ppm")
    assert(viaDecode.toSeq == graft.operators.Multimodal.decodeStub(bad).toSeq)
    // end-to-end: the typed featurize stage uses the real path for ppm
    val media = Seq(
      graft.operators.Multimodal.MediaRow(1L, ppm, "ppm", 4, 2),
      graft.operators.Multimodal.MediaRow(2L, Array[Byte](1, 2, 3), "jpeg", 0, 0))
      .toDS()
    val feats = graft.operators.Multimodal.featurize(media)
      .collect().map(r => r.media_id -> r.features).toMap
    assert(feats(1L).toSeq == f.toSeq, "featurize must use the real ppm decode")
    assert(feats(2L).toSeq ==
      graft.operators.Multimodal.decodeStub(Array[Byte](1, 2, 3)).toSeq)
  }

  test("ppm resize: box-average is pixel-exact; composes with decode; refuses upscale and garbage") {
    val M = graft.operators.Multimodal
    // 4x2 → 2x1: each target pixel averages a 2x2 box, half-up rounding
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    val px = Array(
      255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 255,
      0, 0, 0,     0, 0, 0,     0, 0, 0,     0, 0, 0).map(_.toByte)
    val small = M.resizePpm(header ++ px, 2, 1).get
    assert(new String(small.take(10), "US-ASCII") == "P6\n2 1\n255")
    val sp = small.drop("P6\n2 1\n255\n".length)
    // left box {red, green, black, black}: (255+0+0+0)/4 = 64 (63.75 half-up)
    assert(sp.take(3).map(_ & 0xff).toSeq == Seq(64, 64, 0), sp.take(3).map(_ & 0xff).toSeq)
    // right box {blue, white, black, black}: B = (255+255)/4 = 128 (127.5 half-up)
    assert(sp.slice(3, 6).map(_ & 0xff).toSeq == Seq(64, 64, 128), sp.slice(3, 6).map(_ & 0xff).toSeq)
    // a uniform image resizes to exactly its color at any target dims
    val uni = ("P6\n6 6\n255\n".getBytes("US-ASCII") ++
      Array.fill(6 * 6)(Array(10, 200, 77)).flatten.map(_.toByte))
    for ((tw, th) <- Seq((3, 3), (2, 5), (1, 1))) {
      val r = M.resizePpm(uni, tw, th).get
      val body = r.drop(s"P6\n$tw $th\n255\n".length)
      assert(body.grouped(3).forall(_.map(_ & 0xff).toSeq == Seq(10, 200, 77)),
        s"uniform ${tw}x$th")
    }
    // resized output is a valid PPM for the decoder (composition)
    assert(M.decodePpm(small).isDefined)
    // upscale refused; malformed input refused; bad target dims rejected
    assert(M.resizePpm(header ++ px, 8, 2).isEmpty, "upscale must refuse")
    assert(M.resizePpm(Array[Byte](1, 2, 3), 1, 1).isEmpty)
    assertThrows[IllegalArgumentException](M.resizePpm(header ++ px, 0, 1))
  }

  test("approx_top_k (built-in sketch) is exact below sketch capacity") {
    // 1500 distinct users < the sketch's default tracked capacity, so the
    // DataSketches frequent-items result must equal the exact top-10
    val got = SparkEntry.queries("s_topk_approx_expr")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Tables.events(spark, sfDir)
      .groupBy("user_id").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._2) == exact.take(10).map(_._2).sortBy(-_),
      s"approx counts ${got.map(_._2)} != exact ${exact.take(10).map(_._2)}")
    // membership: every returned user's exact count >= the 10th-largest
    val cut = exact.map(_._2).sorted(Ordering[Long].reverse)(9)
    val exactByUser = exact.toMap
    got.foreach { case (u, c) =>
      assert(exactByUser(u) == c && c >= cut, s"user $u count $c below cut $cut")
    }
  }

  private def docsDf = {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    // 20 base docs + 5 near-dup copies (one token changed) + 1 exact dup
    val base = (0 until 20).map { i =>
      val toks = (0 until 30).map(j => words((i * 7 + j * 3) % words.length))
      (i.toLong, toks.mkString(" "))
    }
    val nearDups = (0 until 5).map { i =>
      val toks = base(i)._2.split(" ").toVector.updated(15, "CHANGED")
      (100L + i, toks.mkString(" "))
    }
    val exactDup = Seq((200L, base(0)._2))
    (base ++ nearDups ++ exactDup).toDF("doc_id", "text")
  }

  test("minhash: est_jaccard finds planted near-dups with high recall") {
    val pairs = MinHashDedup.nearDupPairs(docsDf, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: (i, 100+i) near-dups and (0, 200) exact dup
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).toSet + ((0L, 200L))
    val found = planted.intersect(pairs)
    assert(found.size >= 5, s"recall too low: found $found of $planted")
    assert(pairs.contains((0L, 200L)), "exact dup must always be caught")
  }

  test("minhash: est_jaccard approximates exact jaccard on planted pairs") {
    val sigs = MinHashDedup.signatures(docsDf, "text", "doc_id")
    val pairs = MinHashDedup.candidatePairs(sigs, "doc_id")
      .filter(col("a_id") === 0 && col("b_id") === 200)
      .collect()
    assert(pairs.length == 1 && pairs(0).getDouble(2) == 1.0,
      "identical docs must have est_jaccard 1.0")
  }

  test("simhash: near-identical docs land within hamming 3, fingerprint is stable") {
    val fp = SimHashDedup.fingerprints(docsDf, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(200L), "identical docs must have identical simhash")
    val pairs = SimHashDedup.nearDupPairs(docsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 200L && p._3 == 0L))
  }

  test("ann-lsh: recall@5 vs exact cosine top-5 on real embeddings") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val approx = AnnLsh.approxTopK(spark, emb, probeMaxId = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.queries.SimQueries.queries("q_sim_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (p, ex) =>
      approx.get(p).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // near-uniform random corpus: 0.42 measured at L=8/P=6; bound leaves
    // headroom for plane-seed sensitivity (see AnnLsh scaladoc)
    assert(mean >= 0.35, s"mean recall@5 $mean too low for 8x6-bit LSH")
  }

  test("ann-ivf: corpus-proportional recall@5 beats the LSH floor on real embeddings") {
    // the registry entry runs autoConfig-sized nlist/nprobe (r14) —
    // IVF recall IS coarse recall, so the √n scaling that fixed the
    // IVF-PQ decay applies identically
    val approx = SparkEntry.queries("s_sim_ann_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.queries.SimQueries.queries("q_sim_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (p, ex) =>
      approx.get(p).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // measured 0.98 at autoConfig 89/33 on sf0.001 (was 0.64–0.70 at
    // the frozen 16/6; random corpus = IVF worst case; floor leaves
    // seed-drift headroom)
    info(s"ivf mean recall@5 = $mean")
    assert(mean >= 0.85, s"mean IVF recall@5 $mean below floor")
  }

  test("ann-pq: ADC + exact re-rank recall@5 on real embeddings") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val approx = AnnPq.approxTopK(spark, emb, probeMaxId = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.queries.SimQueries.queries("q_sim_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (p, ex) =>
      approx.get(p).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // the exact re-rank means recall is set by whether true neighbors make
    // the ADC top-`rerank` cut; floor leaves headroom for corpus drift
    assert(mean >= 0.55, s"mean PQ recall@5 $mean below floor")

    // empty corpus must not crash and must keep the documented schema
    val empty = AnnPq.approxTopK(spark, emb.limit(0))
    assert(empty.columns.toSeq == Seq("probe_id", "neighbor_id", "sim", "rn"))
    assert(empty.count() == 0)
  }

  /** Mean recall@5 of the registry IVF-PQ (autoConfig) vs the exact
    * cosine top-5, at the given scale dir.
    */
  private def ivfPqRecall(dir: String): Double = {
    val approx = SparkEntry.queries("s_sim_ann_ivfpq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.queries.SimQueries.queries("q_sim_cosine_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (p, ex) =>
      approx.get(p).map(ap => ap.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("ann-ivfpq: corpus-proportional config holds recall@5 >= 0.85 at 25% scan") {
    // r14 (VERDICT r13 #1): the registry entry runs AnnPq.autoConfig —
    // nlist ∝ √n at fixed scan fraction, rerank ∝ candidate volume;
    // r15 cut the scan 37.5% → 25% at better recall (10√n cells).
    // Measured (PqTune r15): 1.00/0.98/0.98 at sf0.001/0.01/0.1. Floor
    // 0.85 leaves seed-drift headroom below the spec-scale minimum.
    val mean = ivfPqRecall(sfDir)
    info(s"ivfpq mean recall@5 = $mean")
    assert(mean >= 0.85, s"mean IVF-PQ recall@5 $mean below the 0.85 floor")
  }

  test("ann-ivfpq: the floor holds at the LARGEST test corpus (sf0.1) — no silent scale decay") {
    // the r13 defect was precisely a floor asserted only at spec scale
    // while the sf0.1 number sat below it (0.82) — this asserts where
    // the decay actually showed. The r15 25%-scan autoConfig measured
    // 0.98 here; 0.9 is the VERDICT bar with seed-drift headroom.
    val mean = ivfPqRecall("/root/testdata/sf0.1")
    info(s"ivfpq mean recall@5 at sf0.1 = $mean")
    assert(mean >= 0.9, s"mean IVF-PQ recall@5 $mean below the 0.9 sf0.1 floor")
  }

  test("ann-ivfpq spill: duplicated cell assignments dedup, ranks stay dense 1..k") {
    // spill is a default-off knob (measured no-gain at equal scan on
    // this corpus — PqTune r13); the code path must still be valid:
    // a neighbor indexed in 2 cells may enter via both, and the
    // post-rerank dedup must leave exactly one densely-ranked copy
    val emb = Tables.t(spark, sfDir, "embeddings")
    val rows = AnnPq.approxTopK(spark, emb, probeMaxId = 10, k = 5,
        nlist = 8, nprobe = 6, spill = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (p, ns) =>
      assert(ns.map(_._2).distinct.length == ns.length,
        s"probe $p returned a duplicate neighbor: ${ns.toSeq}")
      assert(ns.map(_._3).sorted.toSeq == (1L to ns.length).toSeq,
        s"probe $p ranks not dense: ${ns.toSeq}")
    }
  }

  test("multimodal: featurize preserves ids, emits fixed-width normalized features") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "hello world".getBytes, "txt", 0, 0),
      Multimodal.MediaRow(2L, Array[Byte](), "txt", 0, 0),
      Multimodal.MediaRow(3L, Array.tabulate(1000)(i => (i % 251).toByte), "bin", 0, 0))
    val out = Multimodal.featurize(media.toDS()).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.features.length == Multimodal.FeatureDim))
    assert(math.abs(out(0).features.sum - 1.0f) < 1e-5, "histogram must be normalized")
    assert(out(1).features.forall(_ == 0f), "empty media → zero features, no crash")
    assert(out(0).n_bytes == 11L)
  }

  test("multimodal: frame sampling explodes blobs deterministically, bytes bounded") {
    import spark.implicits._
    val blob = Array.tabulate(1024)(_.toByte)
    val media = Seq(Multimodal.MediaRow(1L, blob, "vid", 0, 0),
      Multimodal.MediaRow(2L, Array[Byte](), "vid", 0, 0)).toDS()
    val frames = Multimodal.explodeFrames(media).collect()
    val forOne = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(forOne.length == 4, s"1024 bytes / stride 256 -> 4 frames, got ${forOne.length}")
    assert(forOne.forall(_.frame.length == 64))
    assert(forOne.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(!frames.exists(_.media_id == 2L), "empty blob yields no frames")
    // frames feed the same featurize stage
    val feats = Multimodal.featurize(Multimodal.explodeFrames(media)
      .map(f => Multimodal.MediaRow(f.media_id * 100 + f.frame_idx, f.frame, "frame", 0, 0)))
    assert(feats.count() == 4)
  }

  test("s_agg_hll: approx distinct within 3*rsd of exact twin") {
    val approx = SparkEntry.queries("s_agg_hll")(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exactDaily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    exactDaily.foreach { case (day, ex) =>
      val ap = approx(day)
      assert(math.abs(ap - ex).toDouble / ex <= 3 * 0.05,
        s"day $day approx $ap vs exact $ex beyond 15%")
    }
  }

  test("s_agg_approx_quantile: within 5% of exact percentile") {
    val approx = SparkEntry.queries("s_agg_approx_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("q_quantile_exact")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (prio, (p50, p90)) =>
      assert(math.abs(approx(prio)._1 - p50) / p50 < 0.05)
      assert(math.abs(approx(prio)._2 - p90) / p90 < 0.05)
    }
  }

  test("ngram df-cutoff: identical to the exact join when cutoff covers max df; subset below") {
    val docs = Tables.t(spark, sfDir, "documents")
    val exact = NgramJaccard.pairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cutoff above every shared shingle's document frequency → provably identical
    val generous = NgramJaccard.pairs(docs, dfCutoff = Some(1000000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(generous.toSeq == exact.toSeq,
      "df-cutoff above max df must not change a single pair")
    // tight cutoff → pair set is a subset with lower-bound jaccard
    val tight = NgramJaccard.pairs(docs, dfCutoff = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exactMap = exact.map(t => (t._1, t._2) -> t._3).toMap
    // intersections only shrink, unions are unchanged → every surviving
    // pair exists in the exact result with jaccard at least as large
    tight.foreach { case (pair, j) =>
      assert(exactMap.contains(pair), s"cutoff invented pair $pair")
      assert(j <= exactMap(pair) + 1e-9, s"cutoff raised jaccard for $pair")
    }
  }

  test("ngram viral shingle: df≈2k pair volume streams, bounded per-row") {
    import spark.implicits._
    // 2000 docs all sharing ONE boilerplate shingle (plus per-doc unique
    // tail) → C(2000,2) ≈ 2M candidate pairs from a single posting list.
    // The pre-fix shape flattened all of them into ONE array value
    // (~2M structs in a single row buffer — the executor-OOM scale bug);
    // the streaming two-level explode materializes O(df) per row, so
    // this completes in seconds. Every cross pair has J = 1/5 < 1/2;
    // docs 0 and 1 are planted identical (J = 1) and must be the only
    // survivors at threshold 1/2.
    val viral = (0L until 2000L).map { i =>
      val tail = if (i <= 1) "dupa dupb" else s"u${i}a u${i}b"
      (i, s"common1 common2 common3 $tail")
    }.toDF("doc_id", "text")
    val out = NgramJaccard.pairs(viral, threshNum = 1, threshDen = 2, sorted = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0L, 1L, 1.0)),
      s"expected only the planted duplicate pair, got ${out.length} rows")
  }

  test("components: chains, cliques and singleton-free labeling") {
    import spark.implicits._
    // component A: 10-node chain 0-1-2-…-9 (worst-case diameter for
    // min-label propagation — needs several rounds, not one)
    // component B: triangle 100-101-102; component C: lone pair 200-201
    val chain = (0L until 9L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L)))
      .toDF("a_id", "b_id")
    val got = DedupClusters.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(i => assert(got(i) == 0L, s"chain node $i → ${got(i)}"))
    Seq(100L, 101L, 102L).foreach(i => assert(got(i) == 100L))
    Seq(200L, 201L).foreach(i => assert(got(i) == 200L))
    assert(got.size == 15, "exactly the paired nodes are labeled")

    val canon = DedupClusters.canonical(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(canon.count(_._3) == 3, "one canonical per component")
    assert(canon.filter(_._3).map(_._1).toSet == Set(0L, 100L, 200L))
  }

  test("k-core: exact cores on clique, triangle+tail, star, chain, bridged cliques") {
    import spark.implicits._
    def cores(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.KCore.coreness(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: everyone core 3
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    assert(cores(k4) == Map(1L->3L, 2L->3L, 3L->3L, 4L->3L))
    // triangle + tail: triangle core 2, tail core 1
    assert(cores(Seq((1L,2L),(2L,3L),(3L,1L),(3L,4L))) ==
      Map(1L->2L, 2L->2L, 3L->2L, 4L->1L))
    // star: EVERY vertex core 1 — the center vanishes with its last leaf
    // and must not be silently dropped (the vanished-set case)
    assert(cores(Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L),(0L,5L))) ==
      (0L to 5L).map(_ -> 1L).toMap)
    // chain: all core 1
    assert(cores(Seq((1L,2L),(2L,3L),(3L,4L))) ==
      Map(1L->1L, 2L->1L, 3L->1L, 4L->1L))
    // two K4s + bridge: still core 3 everywhere (the bridge adds degree
    // but no new dense subgraph); duplicate/reversed edges tolerated
    val bridged = k4 ++ k4.map { case (a,b) => (a+10, b+10) } ++
      Seq((4L, 11L), (11L, 4L), (1L, 2L))
    assert(cores(bridged) ==
      (Seq(1L,2L,3L,4L,11L,12L,13L,14L).map(_ -> 3L)).toMap)
    // self-loops ignored; empty input → empty output
    assert(cores(Seq((1L,1L))).isEmpty)
  }

  test("k-core: degree jumping peels a chain of cliques in O(1) rounds, not O(|V|)") {
    import spark.implicits._
    def counted(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
      val (df, rounds) = graft.operators.KCore.corenessCounted(edges.toDF("src", "dst"))
      (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }
    // 30 K5-cliques in a chain (bridge edge between consecutive cliques):
    // 150 vertices, every core 4. The jump takes k straight to 5 in round
    // one (peeling all clique interiors at once); the leftover bridge
    // pairs peel in round two — rounds must NOT scale with chain length.
    val chainOfCliques = (0 until 30).flatMap { c =>
      val base = c * 5L
      val clique = for (i <- 0 until 5; j <- i + 1 until 5)
        yield (base + i, base + j)
      clique ++ (if (c < 29) Seq((base + 4, base + 5)) else Nil)
    }
    val (cliqueCores, cliqueRounds) = counted(chainOfCliques)
    assert(cliqueCores.size == 150)
    assert(cliqueCores.values.forall(_ == 4L), "every chain-of-cliques vertex is core 4")
    assert(cliqueRounds == 2, s"expected 2 peel rounds, got $cliqueRounds")
    // the documented adversarial shape: a path cascades one wave per
    // endpoint pair at a fixed level — |V|/2 rounds, the formulation's
    // inherent bound (all core 1)
    val path = (1L until 12L).map(i => (i, i + 1))
    val (pathCores, pathRounds) = counted(path)
    assert(pathCores == (1L to 12L).map(_ -> 1L).toMap)
    assert(pathRounds == 6, s"path of 12 peels in |V|/2 = 6 waves, got $pathRounds")
  }

  test("space-saving: heavy hitters exact within (count, err) bounds under eviction") {
    import spark.implicits._
    // Zipf-ish: item i (1..50) appears ceil(600/i) times — vocab 50 > m=8,
    // so eviction happens constantly; shuffled deterministically
    val data = (1 to 50).flatMap(i => Seq.fill(600 / i)(i.toLong))
    val shuffled = new scala.util.Random(7).shuffle(data)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = SpaceSaving.topK(shuffled.toDF("item").repartition(4), "item", m = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 5)
    out.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(truth <= est, s"space-saving must never undercount: $item $est < $truth")
      assert(est - err <= truth, s"err bound violated for $item: est $est err $err truth $truth")
    }
    // the unambiguous top hitters (1, 2) must survive any merge order
    val items = out.map(_._1).toSet
    assert(items.contains(1L) && items.contains(2L),
      s"dominant heavy hitters lost: $items")
  }

  test("bloom: distributed build matches local bits, no false negatives, bounded FP") {
    import spark.implicits._
    val numBits = 4096
    val k = 7
    val seenKeys = (0L until 300L).map(i => i * 0x9E3779B97F4A7C15L + 11L)
    val seen = seenKeys.toDF("fp").repartition(4) // partial buffers must OR-merge
    val bits = BloomDedup.build(seen, col("fp"), numBits, k)
    // reference build, single-threaded
    val expected = new Array[Long](numBits / 64)
    seenKeys.foreach { h =>
      val h1 = h >>> 32; val h2 = (h & 0xffffffffL) | 1L
      (0 until k).foreach { i =>
        val p = ((h1 + i * h2) % numBits).toInt
        expected(p >> 6) |= 1L << (p & 63)
      }
    }
    assert(bits.toSeq == expected.toSeq, "distributed OR-merge must equal local build")
    // SQL probe agrees: every seen key contained (one-sided guarantee)
    val fn = seen.filter(!BloomDedup.mightContain(bits, numBits, k, col("fp"))).count()
    assert(fn == 0L, "a Bloom filter can never produce a false negative")
    // novel keys: FP rate near theory ((1-e^{-kn/m})^k ≈ 2.2% here), not runaway
    val novel = (0L until 2000L).map(i => i * 0xC2B2AE3D27D4EB4FL + 7L)
      .filterNot(seenKeys.toSet)
    val fp = novel.toDF("fp")
      .filter(BloomDedup.mightContain(bits, numBits, k, col("fp"))).count()
    assert(fp.toDouble / novel.size < 0.10, s"false-positive rate too high: $fp/${novel.size}")
  }

  test("q_win_ntile_pct (ScalableNtile) == the single-reducer window formulation, row for row") {
    // since r14 the registry entry IS ScalableNtile — the window
    // formulation it replaced lives on HERE as the equivalence anchor
    // (this is the proof that let the swap keep the oracle hash)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val win = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        ntile(10).over(w).cast("long").as("decile"),
        round(percent_rank().over(w), 6).as("pct"))
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val scalable = SparkEntry.queries("q_win_ntile_pct")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(scalable == win, "scalable ntile must reproduce the window exactly")
    // and again under a different partition count — rank must be partition-invariant
    val scalable7 = ScalableNtile.ntilePct(Tables.t(spark, sfDir, "orders"), 10, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(scalable7 == win, "ntile must be invariant to the repartition width")
  }

  test("ntileBy == window ntile for any sort direction; partition-invariant (q_evt_rfm's machinery)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // n = 23, k = 5 exercises the uneven-bucket closed form (3 big buckets)
    val df = (1L to 23L).map(i => (i, (i * 37 % 23).toDouble)).toDF("k", "v")
    for (sort <- Seq(Seq(col("v").asc, col("k")), Seq(col("v").desc, col("k")));
         parts <- Seq(3, 8)) {
      val expect = df.select(col("k"),
          ntile(5).over(Window.orderBy(sort: _*)).cast("long").as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = ScalableNtile.ntileBy(df, "k", 5, sort, "b", partitions = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"ntileBy diverged from the window (sort=$sort parts=$parts)")
    }
  }

  test("exactPairValve: the contracted exact pair scans fail loudly past the row bound") {
    // within bound: transparent (q_sim_pairs_threshold stays oracle-green,
    // proven by Verify); past the bound: the assert_true guard throws
    // BEFORE a quadratic join can melt a cluster
    val q = SparkEntry.queries("q_sim_pairs_threshold")(spark, sfDir)
    assert(q.count() > 0, "valve must be transparent at test scale")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val ex = intercept[Exception] {
      graft.queries.SimQueries.exactPairValve(emb, emb, bound = 3L, "valve_test")
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("capped at 3 input rows")),
      s"valve must fail loudly with the routing hint, got: ${msgs(ex).mkString(" | ")}")
  }
}
