package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** SURVEY.md §5.3.4 — property tests over operator semantics, with seeded
  * deterministic sampling (scalatest-only; no scalacheck bridge pinned in
  * build.sbt, so generation is hand-rolled).
  */
class PropertySpec extends SparkSpec {

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
