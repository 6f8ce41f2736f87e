package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: before a shuffle join whose build
  * side is too big to broadcast *as rows* but whose JOIN KEYS fit a
  * fixed-size bit array, pre-filter the probe side scan-side with a
  * broadcast Bloom over the build keys. Rows whose key cannot possibly
  * match never enter the exchange — on a selective dim, that deletes
  * most of the fact side's shuffle bytes, which is THE cost at 100 TB.
  * The exact join afterwards clears the (rare) false positives, so the
  * result is identical to the plain join — a DuckDB oracle proves it.
  *
  * This is the explicit, deterministic form of what Spark's own runtime
  * row-level filter (`spark.sql.optimizer.runtime.bloomFilter.*`) does
  * opportunistically behind size thresholds: here the reduction is part
  * of the declared plan, so it survives conf drift, applies at any dim
  * size, and the filter rides the scan inside whole-stage codegen
  * ([[BloomDedup.mightContain]] is built-in integer expressions over a
  * broadcast literal — no UDF).
  *
  * Sizing: one aggregate over the dim computes the m-bit array
  * (OR-mergeable, map-side combined, m/8 bytes to the driver); at
  * m/n = 10 bits per key with k = 7 probes the false-positive rate is
  * ≈ 0.8%, i.e. the join after the filter touches ~1% noise.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on equal `key` (same column name both
    * sides), with the fact side pre-filtered by a Bloom over dim's keys.
    * Result rows == plain `fact.join(dim, key)` exactly.
    */
  def join(fact: DataFrame, dim: DataFrame, key: String,
           numBits: Int = 1 << 17, numHashes: Int = 7): DataFrame = {
    val pre = reduce(fact, dim, col(key), col(key), numBits, numHashes)
    pre.join(dim, Seq(key))
  }

  /** Just the reduction: rows of `fact` whose `factKey` might appear in
    * `dim`'s `dimKey` set (no false negatives — every matching row
    * survives). Useful standalone when the join itself happens later or
    * elsewhere (e.g. pre-shrinking an extract before it is shipped).
    *
    * xxhash64 hashes VALUES BY TYPE — an INT 5 and a BIGINT 5 hash
    * differently even though a plain join would coerce and match them —
    * so mixed integral key types are widened to LONG on both sides
    * before hashing; any other type mismatch is rejected rather than
    * silently dropping every matching row.
    */
  def reduce(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
             numBits: Int = 1 << 17, numHashes: Int = 7): DataFrame = {
    import org.apache.spark.sql.types._
    val ft = fact.select(factKey).schema.head.dataType
    val dt = dim.select(dimKey).schema.head.dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (fk, dk) =
      if (ft == dt) (factKey, dimKey)
      else if (integral(ft) && integral(dt))
        (factKey.cast("long"), dimKey.cast("long"))
      else throw new IllegalArgumentException(
        s"bloom join key types differ and are not both integral: $ft vs $dt")
    val bits = BloomDedup.build(dim, xxhash64(dk), numBits, numHashes)
    fact.filter(BloomDedup.mightContain(bits, numBits, numHashes, xxhash64(fk)))
  }
}
