package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (points-in-intervals) — with [[AsOf]], the second interval
  * operator the reference lacks but event pipelines need constantly
  * ("which window does this timestamp fall in"). Naively this is a pure
  * inequality join, which Spark can only plan as BroadcastNestedLoop (or a
  * cartesian product) — O(|points|·|ranges|) row visits and a non-starter
  * at scale.
  *
  * The scale path is BINNING (the same trick behind Databricks' range-join
  * bin hints): chop the number line into fixed-width bins, assign each
  * point to its one bin, explode each interval into the bins it covers,
  * equi-join on the bin id, and re-check the exact predicate on the
  * matches. A (point, interval) pair meets in EXACTLY one bin — the
  * point's — so the join emits no duplicates by construction. Cost is one
  * hash shuffle on the bin id plus Σ(interval length / binWidth) exploded
  * rows; pick `binWidth` near the median interval length so most intervals
  * land in O(1) bins. Degenerate long intervals cost their length/width in
  * exploded rows — still linear, never quadratic. A HOT bin (a time spike)
  * is ordinary equi-join skew after the rewrite, so AQE's skew-join split
  * handles it — no bespoke mitigation needed, which is the point of
  * reducing to the shapes the optimizer already understands.
  */
object RangeJoin {

  /** Floor-division bin id — the ONE binning rule both operators share
    * (write-side and probe-side binning must agree or matches are silently
    * lost; same discipline as DocStream's constant partition modulus).
    * Exact for |values| < 2^52. */
  private def binCol(c: Column, binWidth: Long): Column = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    floor(c.cast("double") / binWidth).cast("long")
  }

  /** Explode an interval frame into one row per covering bin. lo <= hi is
    * filtered FIRST — sequence(a, b) with b < a would silently generate a
    * DESCENDING ramp. */
  private def explodeBins(df: DataFrame, lo: String, hi: String,
                          binWidth: Long): DataFrame =
    df.where(col(lo) <= col(hi))
      .withColumn("_bin",
        explode(sequence(binCol(col(lo), binWidth), binCol(col(hi), binWidth))))

  /** Inner-join `points` to every interval of `ranges` whose
    * [loCol, hiCol] (inclusive both ends) contains `pointCol`. All columns
    * of both frames survive; aggregate downstream as needed. Inputs are
    * numeric (cast dates/timestamps to days/seconds first); empty
    * intervals (lo > hi) match nothing. Floor division handles negative
    * values consistently on both sides. */
  def pointsInRanges(points: DataFrame, ranges: DataFrame,
                     pointCol: String, loCol: String, hiCol: String,
                     binWidth: Long): DataFrame =
    points.withColumn("_bin", binCol(col(pointCol), binWidth))
      .join(explodeBins(ranges, loCol, hiCol, binWidth), Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")

  /** Inner-join intervals of `left` to intervals of `right` that OVERLAP
    * them ([lo, hi] inclusive; overlap ⇔ lo₁ ≤ hi₂ ∧ lo₂ ≤ h₁). Both
    * sides explode into covering bins, so an overlapping pair can share
    * MANY bins — the duplicate-free trick is to keep a pair only in the
    * bin containing max(lo₁, lo₂), the overlap's left edge, which is
    * covered by both sides exactly once. Same linear cost model as
    * [[pointsInRanges]]; no distinct pass, no quadratic plan. Column
    * names must not collide across the two frames (prefix upstream). */
  def intervalOverlaps(left: DataFrame, right: DataFrame,
                       lo1: String, hi1: String, lo2: String, hi2: String,
                       binWidth: Long): DataFrame =
    explodeBins(left, lo1, hi1, binWidth)
      .join(explodeBins(right, lo2, hi2, binWidth), Seq("_bin"))
      .where(col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        col("_bin") === binCol(greatest(col(lo1), col(lo2)), binWidth))
      .drop("_bin")
}
