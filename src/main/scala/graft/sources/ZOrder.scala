package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-column counterpart of the
  * single-key layouts in [[Bucketing]] and the partitioned store. Sorting a
  * table by the bit-interleaved z-value of two columns makes every written
  * file (and every parquet row group inside it) cover a small RECTANGLE of
  * the (a, b) value space, so min/max footer stats prune scans filtered on
  * EITHER column — a linear sort by `a` alone leaves `b`'s per-file range
  * as wide as the whole table, and a predicate on `b` reads everything.
  * At 100 TB this is the standard data-skipping layout for fact tables
  * queried along more than one dimension (cf. Delta OPTIMIZE ZORDER BY,
  * which does exactly this rewrite).
  *
  * Everything here is built from codegen'd built-ins (`shiftleft`,
  * `bitwiseAND`/`OR`, arithmetic) — the interleave is the classic
  * mask-and-shift bit spread, 5 projection steps, no UDF, no custom
  * expression needed.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` so input bit i lands at output bit 2i
    * (Morton "part1by1", 32 → 64 bits). Steps double the gap between
    * occupied bit groups: 16, 8, 4, 2, 1. */
  def spread32(c: Column): Column = {
    def step(x: Column, sh: Int, mask: Long): Column =
      (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(mask))
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
    val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
    val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
    val x4 = step(x3, 2, 0x3333333333333333L)
    step(x4, 1, 0x5555555555555555L)
  }

  /** 64-bit z-value of two non-negative 32-bit values: `a`'s bits on even
    * positions, `b`'s on odd. For the result to order correctly as a SIGNED
    * long, `b` must stay below 2^31 (its bit 31 becomes the sign bit);
    * callers normalize or mask inputs — [[clusterBy]] scales to 16 bits. */
  def zValue(a: Column, b: Column): Column =
    spread32(a).bitwiseOR(shiftleft(spread32(b), 1))

  /** Min-max scale a numeric column to [0, 2^16) given its (lo, hi) range.
    * Layout-only math — rounding subtleties don't affect correctness, just
    * which side of a cell boundary a row lands on. */
  private def scale16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, 1e-12)
    least(greatest(((c.cast("double") - lit(lo)) / lit(span) * lit(65535.0))
      .cast("long"), lit(0L)), lit(65535L))
  }

  /** Rewrite `df` into `nFiles` parquet files under `path`, clustered by
    * the z-order of `(colA, colB)`: range-partition on the z-value (each
    * file gets a contiguous z-run = a small rectangle of value space), sort
    * within partitions, drop the helper column. One tiny driver-side agg
    * (2 rows of min/max) buys the normalization bounds; the rewrite itself
    * is one range shuffle — the same cost profile as a plain global sort. */
  def clusterBy(df: DataFrame, colA: String, colB: String, path: String,
                nFiles: Int): Unit = {
    val Array(loA, hiA, loB, hiB) = df.agg(
        min(col(colA).cast("double")), max(col(colA).cast("double")),
        min(col(colB).cast("double")), max(col(colB).cast("double")))
      .collect()(0).toSeq.map(v => Option(v).fold(0.0)(_.asInstanceOf[Double]))
      .toArray
    df.withColumn("_z",
        zValue(scale16(col(colA), loA, hiA), scale16(col(colB), loB, hiB)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
