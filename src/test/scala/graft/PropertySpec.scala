package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** SURVEY.md §5.3.4 — property tests over operator semantics, with seeded
  * deterministic sampling (scalatest-only; no scalacheck bridge pinned in
  * build.sbt, so generation is hand-rolled).
  */
class PropertySpec extends SparkSpec {

  test("zvalue quadrant locality: equal high z-bits iff same quadrant (seeded random)") {
    import spark.implicits._
    val rnd = new Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val zs = pts.toDF("a", "b")
      .select(graft.operators.ZOrderLayout.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    pts.zip(zs).foreach { case ((a, b), z) =>
      // top 2 z-bits = the (a,b) half-plane bits at depth 1
      assert(((z >> 30) & 1) == ((a >> 15) & 1), s"a-bit mismatch for ($a,$b)")
      assert(((z >> 31) & 1) == ((b >> 15) & 1), s"b-bit mismatch for ($a,$b)")
    }
  }

  test("bpe: replaying the learned merges never produces an unknown adjacent pair") {
    import spark.implicits._
    val rnd = new Random(7)
    val words = Seq.fill(300)(
      Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar).mkString)
    val text = words.mkString(" ")
    val merges = graft.operators.BpeTrainer
      .train(Seq((1L, text)).toDF("doc_id", "text"), numMerges = 20)
      .collect().map(r => (r.getString(1), r.getString(2)))
    // apply merges in rank order to every word; each merge must fire at
    // least once across the corpus (it was counted from this corpus)
    var tokenized = words.map(w => w.map(_.toString).toVector :+ "</w>")
    merges.foreach { case (l, r) =>
      var fired = false
      tokenized = tokenized.map { syms =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); fired = true; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      assert(fired, s"merge ($l,$r) never fired on its own training corpus")
    }
  }

  test("custom top-k == window formulation on seeded random data with duplicate values") {
    import spark.implicits._
    val rnd = new Random(11)
    // duplicate-heavy values stress the tie-break path
    val rows = Seq.tabulate(5000)(i => (rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(20).toDouble))
    val df = rows.toDF("k", "id", "v").repartition(13)
    val got = graft.plans.GraftTopK.perKey(df, "k", "v", "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  private def trials(n: Int)(body: Random => Unit): Unit =
    (0 until n).foreach(i => body(new Random(42L + i)))

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    import spark.implicits._
    trials(5) { rnd =>
      val xs = List.fill(50)(rnd.nextInt(11))
      val df = xs.toDF("x")
      val once = df.dropDuplicates("x").collect().map(_.getInt(0)).sorted.toSeq
      val twice = df.dropDuplicates("x").dropDuplicates("x")
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(once == twice && once == xs.distinct.sorted)
    }
  }

  test("union-all count additivity") {
    import spark.implicits._
    trials(5) { rnd =>
      val a = List.fill(30)(rnd.nextInt(6))
      val b = List.fill(30)(rnd.nextInt(6))
      assert(a.toDF("x").unionAll(b.toDF("x")).count() == a.size + b.size)
    }
  }

  test("sessionization invariants: every event in exactly one session; " +
    "session count monotonically non-increasing in gap") {
    import spark.implicits._
    trials(3) { rnd =>
      val ts = List.fill(40)(rnd.nextLong(100000L))
      def sessions(gapUs: Long): Seq[(Long, Long)] = {
        val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("event_id", "us")
        val w = org.apache.spark.sql.expressions.Window.orderBy("us", "event_id")
        df.withColumn("brk",
            when(col("us") - lag("us", 1).over(w) > gapUs, 1).otherwise(0))
          .withColumn("sid", sum("brk").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy("sid").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      }
      val small = sessions(1000L)
      val large = sessions(50000L)
      assert(small.map(_._2).sum == ts.size, "every event in exactly one session")
      assert(large.map(_._2).sum == ts.size)
      assert(large.size <= small.size, "bigger gap => fewer or equal sessions")
    }
  }

  test("approx_count_distinct relative error bounded across cardinalities") {
    import spark.implicits._
    for (n <- Seq(100, 500, 2000, 5000)) {
      val df = (0 until n).toDF("x")
      val approx = df.agg(approx_count_distinct("x").as("a")).collect()(0).getLong(0)
      assert(math.abs(approx - n).toDouble / n <= 3 * 0.05,
        s"n=$n approx=$approx beyond 15%")
    }
  }

  test("sort stability under tie-break keys: total order is deterministic " +
    "across partition counts") {
    import spark.implicits._
    trials(3) { rnd =>
      val rows = List.fill(60)((rnd.nextInt(4), rnd.nextInt(1000)))
        .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      val df = rows.toDF("k", "v", "id")
      val a = df.repartition(4).orderBy("k", "v", "id").collect().toSeq
      val b = df.repartition(7).orderBy("k", "v", "id").collect().toSeq
      assert(a == b)
    }
  }

  test("minhash est_jaccard is a [0,1] similarity, symmetric-by-construction") {
    import spark.implicits._
    trials(2) { rnd =>
      val words = Seq("a", "b", "c", "d", "e", "f")
      val docs = (0 until 10).map(i =>
        (i.toLong, List.fill(20)(words(rnd.nextInt(words.length))).mkString(" ")))
        .toDF("doc_id", "text")
      val sigs = operators.MinHashDedup.signatures(docs, "text", "doc_id")
      val est = operators.MinHashDedup.candidatePairs(sigs, "doc_id")
        .collect().map(_.getDouble(2))
      assert(est.forall(e => e >= 0.0 && e <= 1.0))
    }
  }
}
