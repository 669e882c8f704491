package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter semi-join pruning.
  *
  * Spark's own runtime filter (`InjectRuntimeFilter`) covers the
  * join-adjacent case, but only fires when the optimizer sees both sides of
  * a single join and the probe scan clears its size thresholds (the PlanSpec
  * pin exercises that path). This operator is the composable version for
  * everything the optimizer can't reach: pruning a scan feeding an
  * aggregation, filtering a stream against yesterday's key set, or pushing a
  * membership pre-filter computed in one job into another job entirely.
  *
  * Scale shape (the whole point at 100 TB): the filter itself is
  * `2^log2Bits / 8` bytes (16 KB at the default) regardless of corpus size —
  * it rides the closure to every task as a plan literal, so the probe side
  * tests membership in its scan stage, BEFORE any exchange, and only
  * survivors (true matches + the small false-positive mass) reach the
  * shuffle. The build is one map-side-combining `bit_or` aggregate over at
  * most `nWords` groups; the driver collect is bounded at `nWords`
  * aggregated rows (2048 at the default), never at key cardinality.
  *
  * A Bloom test alone admits false positives, so [[Mask.mightContain]] is a
  * PRUNE, not a join: callers follow it with the exact equi-join (see
  * `Analytics.q90BloomPrune`), which keeps results bit-identical to the
  * unpruned plan — the filter only shrinks what the join has to move.
  * No-false-negative and false-positive-rate properties are pinned in
  * BloomPruneSpec.
  */
object BloomPrune {

  /** A built filter: `words(i)` holds bits `[64*i, 64*i+64)`. */
  final case class Mask(words: Array[Long], nBits: Long, nHashes: Int) {

    /** Membership test as a pure `Column` — codegen'd bit arithmetic over a
      * literal array (no UDF, no broadcast variable): for each seed,
      * `pos = pmod(xxhash64(seed, key), nBits)`, then test bit `pos % 64` of
      * word `pos >> 6`. NULL keys test NULL (excluded by a WHERE, same as
      * any join key). */
    def mightContain(key: Column): Column = {
      val arr = typedLit(words.toSeq)
      (1 to nHashes).map { seed =>
        val pos = pmod(xxhash64(lit(seed), key), lit(nBits))
        val word = element_at(arr,
          call_function("shiftright", pos, lit(6)).cast("int") + 1)
        call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }.reduce(_ && _)
    }
  }

  /** [[build]] with the bit count sized to the OBSERVED build cardinality
    * (~16 bits/key → fp ≈ (3/16)^3 ≈ 0.7%), because a fixed-size mask has
    * a cliff: 2^17 bits saturate near ~40k keys and the filter silently
    * stops filtering. Costs one extra count() over the (dim-sized) build
    * side. The cap at 2^23 bits (1 MB of plan literal per probe seed)
    * marks where this plan-literal design hands over to Spark's own
    * broadcast-based runtime filter — beyond ~500k build keys you want
    * `InjectRuntimeFilter` (PlanSpec pins it firing), not a literal. */
  def buildSized(keys: DataFrame, keyCol: String, bitsPerKey: Int = 16,
      nHashes: Int = 3): Mask = {
    val n = keys.count().max(1L)
    val log2Bits = (64 - java.lang.Long.numberOfLeadingZeros(
      n * bitsPerKey - 1)).max(14).min(23)
    build(keys, keyCol, log2Bits, nHashes)
  }

  /** Build a mask over the (assumed comparatively small — dim-sized, not
    * fact-sized) key set. Runs one Spark job eagerly: positions explode
    * nHashes-fold, partial-aggregate per word on the map side, and at most
    * `nBits/64` (word, bits) rows reach the driver. */
  def build(keys: DataFrame, keyCol: String, log2Bits: Int = 17,
      nHashes: Int = 3): Mask = {
    require(log2Bits >= 6 && log2Bits <= 30, s"log2Bits out of range: $log2Bits")
    val nBits = 1L << log2Bits
    val nWords = (nBits >> 6).toInt
    val rows = keys
      .select(explode(array((1 to nHashes).map(seed =>
        pmod(xxhash64(lit(seed), col(keyCol)), lit(nBits))): _*)).as("pos"))
      .select(call_function("shiftright", col("pos"), lit(6)).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast("int")).as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
      .collect() // bounded: ≤ nWords aggregated rows — NOT a key collect
    val words = new Array[Long](nWords)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Mask(words, nBits, nHashes)
  }
}
