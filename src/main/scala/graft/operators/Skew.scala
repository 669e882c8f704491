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

  /** The salted big side: `_salt` in [0, salts) hashed from the ROW'S OWN
    * COLUMNS, never from a synthetic id. monotonically_increasing_id (or
    * rand) is assigned by arrival order, and when the big side sits
    * downstream of a shuffle a fetch-failure recompute can re-enumerate
    * rows in a different order — the same row then lands on a different
    * reducer than the partially-reused first attempt, duplicating or
    * dropping joined rows (the SPARK-23207 class of bug). A content hash
    * is recompute-stable; its residual is that IDENTICAL duplicate rows
    * share a salt and don't spread — hot keys in real fact tables carry
    * distinct payloads, which is exactly what the hash spreads on.
    * Exposed so the spec can pin the property the operator exists for:
    * max per-(key, salt) group ≈ max per-key / salts. */
  private[graft] def saltBig(big: DataFrame, salts: Int): DataFrame = {
    val saltCol: Column =
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong))
    big.withColumn("_salt", saltCol)
  }

  /** `forceShuffle` pins the replicated small side to a shuffled hash join
    * (`shuffle_hash` hint). At test scale AQE would broadcast a small dim,
    * making the salting a no-op demo; on the real workloads this operator
    * targets the small side is past broadcast size and shuffles anyway. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, forceShuffle: Boolean = false): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    val smallSide = if (forceShuffle) smallS.hint("shuffle_hash") else smallS
    saltBig(big, salts).join(smallSide, Seq(key, "_salt")).drop("_salt")
  }
}
