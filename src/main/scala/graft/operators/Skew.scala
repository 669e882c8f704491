package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY scale-hazard toolkit).
  *
  * AQE's skew-join handles most cases at runtime; this explicit salted join
  * is for the pathological ones AQE can't split (e.g. a single key holding
  * a double-digit share of the fact side): the big side is salted into
  * `salts` pseudo-keys, the small side is replicated `salts`×, and the join
  * key becomes (key, salt) — one hot partition becomes `salts` even ones.
  * Join semantics are unchanged (inner equi-join on the original key).
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // salt derived from the whole big row via a hash of a unique-ish column
    // set: any distribution works — correctness never depends on it
    val saltCol: Column =
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))
    val bigS = big.withColumn("_salt", saltCol)
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
