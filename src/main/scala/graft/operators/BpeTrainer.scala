package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding tokenizer training (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units") — the step that
  * turns a curated corpus into a tokenizer's merge table.
  *
  * Split of labor, which is also the industrial 100 TB shape: the CORPUS
  * pass is one distributed aggregation down to the word-TYPE histogram
  * (types grow ~Heaps' law — millions of rows where the token stream is
  * trillions; prune count==1 types to bound it harder), and the merge
  * loop then runs driver-side over that histogram — each merge only
  * re-pairs the words that contain it, so no per-merge cluster job is
  * ever worth its scheduling cost. The merge table (a few thousand rows)
  * is what ships; applying it to text is an embarrassingly parallel map.
  *
  * Determinism: ties on pair count break lexicographically on (left,
  * right), so the merge sequence is a pure function of the histogram.
  */
object BpeTrainer {

  /** End-of-word sentinel — distinguishes "low " from "lower"'s prefix. */
  val EndOfWord = "</w>"

  /** The first `numMerges` BPE merges as (rank, left, right, pair_count);
    * stops early when the best remaining pair occurs < `minCount` times.
    */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 64,
            minCount: Long = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // distributed: corpus → word-type histogram (the only corpus-sized pass)
    val hist: Array[(String, Long)] = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val merges = trainOnHistogram(hist, numMerges, minCount)
    merges.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Driver-side merge loop over a word histogram: greedy
    * most-frequent-adjacent-pair, weighted by word count.
    */
  private[operators] def trainOnHistogram(hist: Array[(String, Long)],
                                          numMerges: Int,
                                          minCount: Long): Vector[(String, String, Long)] = {
    var words: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, c)
    }
    val out = Vector.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        // max by count; ties lexicographic on (left, right) — deterministic
        val ((l, rt), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minCount) done = true
        else {
          out += ((l, rt, c))
          val m = l + rt
          words = words.map { case (syms, cnt) =>
            if (syms.length < 2) (syms, cnt)
            else {
              val b = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rt) {
                  b += m; i += 2
                } else { b += syms(i); i += 1 }
              }
              (b.result(), cnt)
            }
          }
          r += 1
        }
      }
    }
    out.result()
  }
}
