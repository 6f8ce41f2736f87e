package graft

import graft.operators.MediaContainers._

/** Container-metadata parsing for the codec-less formats (r15 — the
  * feasible half of the mp3/mp4/webp stub): the box/chunk/frame-header
  * walks must recover every fixture parameter exactly, and refuse
  * hostile or torn framing instead of looping, over-reading, or
  * throwing inside a task.
  */
class MediaContainersSpec extends SparkSpec {

  test("mp4: every generator parameter round-trips through the box walk") {
    val m = parseMp4(synthMp4(durationMs = 2500, timescale = 1000,
      w = 640, h = 480, audioRate = 16000, videoFrames = 75)).get
    assert(m == ContainerMeta("mp4", 2500, 640, 480, 16000, 75, 2))
    // 64-bit-duration and track-order independence ride the same walk;
    // a video-only file reports -1 sample rate is NOT constructible with
    // this fixture writer (it always writes both tracks) — pin the
    // no-track fallbacks on a moov with zero traks instead
    val bare = parseMp4(synthMp4(1000, 1000, 320, 240, 8000, 24))
    assert(bare.exists(_.nTracks == 2))
  }

  test("mp4: hostile framing refuses — truncation, lying box sizes, missing ftyp") {
    val ok = synthMp4(1500, 1000, 320, 240, 8000, 30)
    assert(parseMp4(ok.take(ok.length / 2)).isEmpty, "torn file")
    assert(parseMp4(ok.drop(8)).isEmpty, "no leading ftyp")
    // a box declaring a size past the buffer must refuse, not over-read
    val lying = ok.clone()
    lying(0) = 0x7f.toByte // ftyp size becomes huge
    assert(parseMp4(lying).isEmpty)
    // a zero-size inner box (runs-to-end) that breaks the tiling refuses
    assert(parseMp4(Array[Byte](0, 0, 0, 8) ++ "ftyp".getBytes ++
      Array[Byte](0, 0, 0, 3) ++ "moov".getBytes).isEmpty)
    assert(parseMp4(Array.empty[Byte]).isEmpty)
    // an stsz declaring more per-sample entries than its box holds is a
    // lying header — refuse, never let a downstream table reader over-read
    val lyingCount = ok.clone()
    val stszAt = {
      var i = -1
      for (p <- 0 until lyingCount.length - 4 if i < 0)
        if (new String(lyingCount, p, 4, "US-ASCII") == "stsz") i = p
      i
    }
    assert(stszAt > 0, "fixture sanity: stsz present")
    lyingCount(stszAt + 12) = 0x7f // sample_count high byte: count >> box
    assert(parseMp4(lyingCount).isEmpty)
  }

  test("mp4: version-1 mvhd parses exactly; a 28-byte-body v1 mvhd refuses (r15 ADVICE bound)") {
    def be32b(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64b(v: Long) = be32b(v >> 32) ++ be32b(v & 0xffffffffL)
    def mkBox(typ: String, body: Array[Byte]) =
      be32b(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = mkBox("ftyp", "isom".getBytes ++ be32b(512) ++ "isomiso2".getBytes)
    // well-formed v1: 4B ver/flags + 8B ctime + 8B mtime + 4B timescale + 8B duration
    val v1ok = mkBox("mvhd", Array[Byte](1, 0, 0, 0) ++ be64b(0) ++ be64b(0) ++
      be32b(600) ++ be64b(1800))
    assert(parseMp4(ftyp ++ mkBox("moov", v1ok))
      .contains(ContainerMeta("mp4", 3000, -1, -1, -1, -1, 0)))
    // exactly 28 body bytes: the be64 duration read would run 4 bytes past
    // the box — must refuse via the guard, never over-read or throw
    val v1torn = mkBox("mvhd", Array[Byte](1, 0, 0, 0) ++ be64b(0) ++ be64b(0) ++
      be32b(600))
    assert(parseMp4(ftyp ++ mkBox("moov", v1torn)).isEmpty)
    // same torn box at the very end of the buffer (no trailing sibling
    // bytes to silently absorb the over-read) — still None, no throw
    assert(parseMp4(ftyp ++ mkBox("moov", v1torn ++ mkBox("free", Array.empty))).isEmpty)
  }

  test("mp4: pathological box nesting refuses at the depth cap instead of overflowing the stack") {
    // 60k nested 8-byte mdia containers sit far under MaxWalkSteps but
    // would recurse 60k frames deep — the depth cap must refuse early
    val n = 60000
    val ftyp = Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0)
    val nested = new Array[Byte](8 * n + 8)
    for (i <- 0 until n) {
      val size = 8L * (n - i) + 8
      val o = 8 * i
      nested(o) = ((size >> 24) & 0xff).toByte
      nested(o + 1) = ((size >> 16) & 0xff).toByte
      nested(o + 2) = ((size >> 8) & 0xff).toByte
      nested(o + 3) = (size & 0xff).toByte
      "mdia".getBytes("US-ASCII").copyToArray(nested, o + 4)
    }
    val o = 8 * n
    nested(o + 3) = 8; "free".getBytes("US-ASCII").copyToArray(nested, o + 4)
    assert(parseMp4(ftyp ++ nested).isEmpty) // refused, not StackOverflowError
    // sanity: real nesting (synthMp4 is 5 deep) stays under the cap
    assert(parseMp4(synthMp4(1000, 1000, 320, 240, 8000, 24)).isDefined)
  }

  test("webp: still and animated fixtures round-trip; VP8 lossy header parses") {
    assert(parseWebp(synthWebp(113, 89)).contains(
      ContainerMeta("webp", -1, 113, 89, -1, 1, 1)))
    assert(parseWebp(synthWebpAnim(64, 48, frames = 5, frameMs = 40)).contains(
      ContainerMeta("webp", 200, 64, 48, -1, 5, 1)))
    // hand-built lossy VP8 chunk: 3B frame tag + 9D 01 2A + 14-bit dims
    def le32b(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val vp8 = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (300 & 0xff).toByte, (300 >> 8).toByte, (200 & 0xff).toByte, (200 >> 8).toByte)
    val body = "WEBP".getBytes("US-ASCII") ++
      "VP8 ".getBytes("US-ASCII") ++ le32b(vp8.length.toLong) ++ vp8
    val blob = "RIFF".getBytes("US-ASCII") ++ le32b(body.length.toLong) ++ body
    assert(parseWebp(blob).contains(ContainerMeta("webp", -1, 300, 200, -1, 1, 1)))
  }

  test("webp: hostile framing refuses — bad magic, torn chunk, broken VP8L signature") {
    val ok = synthWebp(64, 48)
    assert(parseWebp(ok.take(ok.length - 3)).isEmpty, "chunk past buffer")
    assert(parseWebp("RIFF1234WAVE".getBytes).isEmpty, "not WEBP")
    val badSig = ok.clone()
    badSig(20) = 0x30 // VP8L signature byte must be 0x2F
    assert(parseWebp(badSig).isEmpty)
    assert(parseWebp(Array.empty[Byte]).isEmpty)
  }

  test("mp3: frame chain + ID3v2 skip recover rate, frame count and duration exactly") {
    for (srIdx <- 0 to 2; brIdx <- Seq(1, 9, 14); id3 <- Seq(0, 33)) {
      val sr = Seq(44100, 48000, 32000)(srIdx)
      val m = parseMp3(synthMp3(srIdx, brIdx, nFrames = 7, id3Bytes = id3)).get
      assert(m == ContainerMeta("mp3", 7L * 1152 * 1000 / sr, -1, -1, sr, 7, 1),
        s"srIdx=$srIdx brIdx=$brIdx id3=$id3 -> $m")
    }
  }

  test("mp3: padding bits and MPEG2 framing parse exactly (frame lengths follow the headers)") {
    // padded CBR: every 3rd frame one byte longer, declared by its own
    // header — the walk must follow the declared lengths, not a stride
    val sr1 = 44100
    val padded = parseMp3(synthMp3(0, 9, nFrames = 9, padEvery = 3)).get
    assert(padded == ContainerMeta("mp3", 9L * 1152 * 1000 / sr1, -1, -1, sr1, 9, 1))
    // MPEG2: half frame size, 576 samples/frame, the low-rate regime
    for (srIdx <- 0 to 2) {
      val sr = Seq(22050, 24000, 16000)(srIdx)
      val m = parseMp3(synthMp3(srIdx, brIdx = 8, nFrames = 6, mpeg1 = false)).get
      assert(m == ContainerMeta("mp3", 6L * 576 * 1000 / sr, -1, -1, sr, 6, 1),
        s"MPEG2 srIdx=$srIdx -> $m")
    }
    // an MPEG1/MPEG2 splice is a rate jump — refuses
    assert(parseMp3(synthMp3(0, 9, 2) ++ synthMp3(0, 8, 2, mpeg1 = false)).isEmpty)
  }

  test("mp3: MPEG2.5 (version bits 0) parses with its OWN rate table (r15 ADVICE)") {
    // routing 2.5 through the MPEG2 table would report a 2x-wrong
    // rate/duration — the parser must use 11025/12000/8000
    for (srIdx <- 0 to 2) {
      val sr = Seq(11025, 12000, 8000)(srIdx)
      val m = parseMp3(synthMp3(srIdx, brIdx = 8, nFrames = 6,
        mpeg1 = false, mpeg25 = true)).get
      assert(m == ContainerMeta("mp3", 6L * 576 * 1000 / sr, -1, -1, sr, 6, 1),
        s"MPEG2.5 srIdx=$srIdx -> $m")
    }
    // a 2.5/2 splice is a rate jump — refuses like any mid-stream change
    assert(parseMp3(synthMp3(0, 8, 2, mpeg1 = false, mpeg25 = true) ++
      synthMp3(0, 8, 2, mpeg1 = false)).isEmpty)
  }

  test("mp3: ID3v1 trailer parses as metadata, not garbage; strict tiling wins first (r16)") {
    val sr = 44100
    // ID3v2 header + frames + ID3v1 trailer — the full real-file shape
    val m = parseMp3(synthMp3(0, 9, nFrames = 5, id3Bytes = 21, id3v1 = true)).get
    assert(m == ContainerMeta("mp3", 5L * 1152 * 1000 / sr, -1, -1, sr, 5, 1))
    // a trailer-sized junk block WITHOUT the TAG magic stays garbage
    val junk = synthMp3(0, 9, 3) ++ Array.tabulate[Byte](128)(i => (i % 96 + 32).toByte)
    assert(parseMp3(junk).isEmpty)
    // "TAG" at the wrong distance from the end is not a trailer
    assert(parseMp3(synthMp3(0, 9, 3) ++ "TAG".getBytes ++ new Array[Byte](100)).isEmpty)
    // strict tiling wins first: a file whose FINAL FRAME contains "TAG"
    // exactly 128 bytes from the end must still parse whole (never
    // truncated into a torn frame by the trailer heuristic)
    val ok = synthMp3(0, 9, nFrames = 4)
    val tagged = ok.clone()
    val at = ok.length - 128
    tagged(at) = 'T'; tagged(at + 1) = 'A'; tagged(at + 2) = 'G'
    assert(parseMp3(tagged).exists(_.nFrames == 4))
  }

  test("mp3: hostile framing refuses — torn frame, sync loss, rate jump, garbage") {
    val ok = synthMp3(0, 9, nFrames = 4)
    assert(parseMp3(ok.take(ok.length - 10)).isEmpty, "torn final frame")
    assert(parseMp3(ok ++ Array[Byte](1, 2, 3)).isEmpty, "trailing garbage")
    val mixed = synthMp3(0, 9, 2) ++ synthMp3(1, 9, 2)
    assert(parseMp3(mixed).isEmpty, "sample rate must not jump mid-stream")
    assert(parseMp3("ID3junkjunkjunk".getBytes).isEmpty)
    assert(parseMp3(Array.empty[Byte]).isEmpty)
    // free-format bitrate (index 0) and reserved rate (index 3) refuse
    val free = ok.clone(); free(2) = 0x00
    assert(parseMp3(free).isEmpty)
  }

  test("dispatch routes by format and refuses unknown formats") {
    assert(parse(synthMp4(1000, 1000, 320, 240, 8000, 24), "mp4").isDefined)
    assert(parse(synthWebp(32, 32), "webp").isDefined)
    assert(parse(synthMp3(0, 9, 3), "mp3").isDefined)
    assert(parse(synthMp3(0, 9, 3), "ogg").isEmpty)
    // cross-format bytes refuse rather than misparse
    assert(parse(synthWebp(32, 32), "mp4").isEmpty)
    assert(parse(synthMp4(1000, 1000, 320, 240, 8000, 24), "mp3").isEmpty)
  }

  test("s_mm_container_meta: zero violations corpus-wide (the registry self-proof)") {
    val row = SparkEntry.queries("s_mm_container_meta")(spark, sfDir).collect()(0)
    val n = row.getLong(row.fieldIndex("n_docs"))
    assert(n > 0)
    for (c <- Seq("mp4_ok", "webp_ok", "webp_anim_ok", "mp3_ok"))
      assert(row.getLong(row.fieldIndex(c)) == n, s"$c != $n")
    assert(row.getLong(row.fieldIndex("violations")) == 0L)
  }
}
