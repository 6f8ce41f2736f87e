package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass signature aggregators for the dedup operators.
  *
  * Round 1 computed SimHash/MinHash signatures as 64 SEPARATE aggregate
  * columns (`sum(when((h >> b) & 1 = 1, 1, -1))` × 64, `min(xxhash64(i,
  * hbase))` × 64). That evaluates 64 expression trees per token row and
  * blows the generated aggregate method past the JIT-friendly size — it
  * was the slowest part of the whole bench. These Aggregators keep ONE
  * primitive long-array buffer per key and update it in a tight loop:
  * one narrow aggregate instead of 64 wide ones.
  *
  * Both remain mergeable partial aggregates (map-side combine before the
  * shuffle — the 100 TB shape); the buffer crosses the wire as a single
  * fixed-width array<bigint>.
  *
  * Hash identity: MinHashAgg reproduces Spark SQL's `xxhash64(lit(i),
  * hbase)` bit for bit — that expression folds seed 42 through
  * XXH64.hashInt(i) then XXH64.hashLong(hbase) — so signatures (and every
  * downstream band/bucket/recall result) are unchanged from round 1.
  */
object SignatureAggs {

  /** 64-bit SimHash over token hashes: per bit, sign of Σ(bit set ? +1 : -1). */
  class SimHashAgg extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](64)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var b = 0
      while (b < 64) {
        // +1 if bit b of h is set, else -1
        buf(b) += (((h >>> b) & 1L) << 1) - 1L
        b += 1
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 64) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(buf: Array[Long]): Long = {
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (buf(b) >= 0L) fp |= (1L << b) // same >= 0 tie rule as round 1
        b += 1
      }
      fp
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** MinHash signature: per seed i, min over tokens of xxhash64(i, hbase). */
  class MinHashAgg(numHashes: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    // hashInt(i, 42) is a constant per position — precompute the seeds once
    // per executor (lazy + transient: the aggregator ships serialized)
    @transient private lazy val seeds: Array[Long] =
      Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], hbase: Long): Array[Long] = {
      val s = seeds
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(hbase, s(i))
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        if (b2(i) < b1(i)) b1(i) = b2(i)
        i += 1
      }
      b1
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
