package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Fixture-drift tripwires for the three hash-graded audio queries
  * (ADVICE r16).
  *
  * s_mm_audio_codec no longer depends on sin() at all — its PCM is the
  * pure-BIGINT LCG recurrence [[Multimodal.lcgPcm16]], whose DuckDB
  * twin [[Multimodal.LcgPcmSql]] is interpolated from the same
  * definition. The pinned per-class hashes here freeze the SCALA side:
  * an edit to `lcgPcm16` that forgets the SQL twin reds here; an edit
  * to `LcgPcmSql` that forgets the Scala side reds at the t2 oracle.
  *
  * s_mm_wav_decode and s_mm_audio_frames still hash-grade values
  * descending from each engine's own sin() (their 0.1 Hz / 3 dp
  * roundings carry real margin, unlike the codec's old round(drift,6)
  * — but trunc boundaries sit as close as 6.1e-15 to the flip point,
  * measured r17). These pins are the SIN-AGREEMENT tripwire: if a JDK
  * or libm change moves Math.sin enough to flip ANY trunc'd sample,
  * this spec fails by name instead of t2 failing mysteriously. (A
  * DuckDB-side sin drift still lands on t2; this catches the JVM half
  * and documents the contract.)
  */
class AudioFixtureTripwireSpec extends AnyFunSuite {

  private def polyHash(vs: Iterator[Int]): Long =
    vs.foldLeft(0L)((h, v) => h * 31 + v)

  test("lcgPcm16 per-class sample hashes are pinned (codec fixture contract)") {
    val pinned = Array(
      -3816246339695856399L, 2284045839612275217L, -7452755059407263720L,
      -7147074656678110031L, 6664907309026886609L, -688251460153956776L,
      -277780444234602895L, 9105613148338289553L, -541696421011389800L,
      -8777231888383422415L, -2503462160089852591L, -6133994775084646184L,
      7989950026041415665L, -3213153679760093935L, -2369362432134029544L,
      -167420107586207311L, 4541258383672829649L, 33660265656916824L,
      -5165520203480004239L, 8841276318740275345L)
    for (k <- 0 until 20) {
      val h = polyHash((0 until 400).iterator.map(i => Multimodal.lcgPcm16(k, i)))
      assert(h == pinned(k),
        s"lcgPcm16 class $k drifted: $h != ${pinned(k)} — if intentional, " +
          "update LcgPcmSql AND these pins together")
    }
  }

  test("lcgPcm16 stays inside ±0.4 FS and covers the µ-law segment ladder") {
    val all = for (k <- 0 until 20; i <- 0 until 400) yield Multimodal.lcgPcm16(k, i)
    assert(all.forall(v => v >= -13107 && v <= 13107))
    // G.711 segment index of |v|+132 must span 0..6 (13107+132 >> 7 = 103)
    val segs = all.map { v =>
      val a = math.min(math.abs(v), 32635) + 132 // a >= 132 so a>>7 >= 1
      math.min(31 - java.lang.Integer.numberOfLeadingZeros(a >> 7), 7)
    }.toSet
    assert((0 to 6).forall(segs.contains), s"segments covered: $segs")
  }

  test("Math.sin tripwire: s_mm_wav_decode fixture samples are bit-stable") {
    val pinned = Array(
      1045659990985390080L, 9071457421457453056L, 575026925200606208L,
      -2165294357504045056L, -3862713703356205056L, -1168029969341607936L,
      -7538566117025204224L, -3915505620470531072L, 8678711836843584512L,
      3995014888706704384L, -1927301064437904384L, 8777664377988791296L,
      6790923920199810048L, -1248299666198362112L, 4984883561546787840L,
      -8004391303448378368L, -8425759659292588032L)
    for (k <- 0 until 17) {
      val freq = 200.0 + k * 100.0
      val h = polyHash((0 until 400).iterator
        .map(i => (0.4 * math.sin(2 * math.Pi * freq * i / 8000) * 32767).toInt))
      assert(h == pinned(k),
        s"trunc'd-sine class $k drifted (JDK sin changed?): the " +
          "s_mm_wav_decode oracle rides cross-engine sin agreement — " +
          "re-derive its expected est_hz groups before trusting t2")
    }
  }

  test("Math.sin tripwire: s_mm_audio_frames fixture samples are bit-stable") {
    val pinned = Array(
      2013047838424545536L, -6286240570314945280L, -4510183226090139392L,
      1445920193169556224L, 7406662409134918400L, 986027721088916736L,
      9164067578426106880L, -446515410310689024L, -717162935732373760L,
      2803787528215544064L, 566966705418220288L, 1453313474189845248L,
      -7233068568037590272L, 8830030799559614720L, -418412818573017088L,
      -932664783588658432L, -6242309316768558848L)
    for (k <- 0 until 17) {
      val freq = 200.0 + k * 100.0
      val h = polyHash((0 until 800).iterator.map { i =>
        val amp = if (i < 400) 0.6 else 0.15
        (amp * math.sin(2 * math.Pi * freq * i / 8000) * 32767).toInt
      })
      assert(h == pinned(k),
        s"trunc'd-sine class $k drifted (JDK sin changed?): the " +
          "s_mm_audio_frames oracle rides cross-engine sin agreement — " +
          "re-check its 3 dp RMS rows before trusting t2")
    }
  }
}
