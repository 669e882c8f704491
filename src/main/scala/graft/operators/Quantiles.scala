package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global quantiles WITHOUT a total sort — the two-pass
  * histogram-refine selection that replaces `ORDER BY` on the full table
  * (a single-partition sort at 100 TB) with three keyed passes:
  *
  *   1. one aggregation scan for (min, max, count);
  *   2. one map-side-combining histogram over `nBins` fixed-width bins —
  *      the ONLY driver state is that nBins-row census (bounded by
  *      construction, folded to cumulative counts on the driver);
  *   3. one refine scan whose value-range filter keeps ONLY the bins
  *      containing a target rank (~n/nBins rows per target), sorts those
  *      partition-locally, and picks the residual rank. When `valueCol`
  *      is a raw integral column the range pushes through the alias into
  *      the parquet scan (row-group pruning); for a computed column
  *      (e.g. on-the-fly cents quantization, q135) the scan re-reads the
  *      one column and the filter runs in the scan's codegen stage —
  *      store the quantized value to get pushdown.
  *
  * Compare `approx_percentile`: same pass structure but EXACT — the answer
  * is the true k-th smallest, k = 1 + ⌊p·(n−1)⌋ (lower nearest-rank), not
  * a sketch bound. Ties are value-ties only, so the selected VALUE is
  * well-defined regardless of tie order. Input values must be integral
  * (longs — quantize money to cents first); duplicate-heavy single-value
  * bins cost one partition-local sort of that bin, never a global one.
  */
object Quantiles {

  /** `quantilesBp`: targets in basis points (5000 = median). Returns one
    * row per target: (p_bp, rank, value) ordered by p_bp. */
  def exactQuantiles(df: DataFrame, valueCol: Column,
                     quantilesBp: Seq[Int], nBins: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(quantilesBp.nonEmpty && quantilesBp.forall(p => p >= 0 && p <= 10000),
      s"quantile targets must be basis points in [0, 10000]: $quantilesBp")
    val v = df.select(valueCol.cast("long").as("v")).where($"v".isNotNull)
    // pass 1: domain + cardinality (one scalar row)
    val head = v.agg(min($"v"), max($"v"), count(lit(1))).first()
    if (head.isNullAt(0))
      return Seq.empty[(Int, Long, Long)].toDF("p_bp", "rank", "value")
    val (lo, hi, n) = (head.getLong(0), head.getLong(1), head.getLong(2))
    // BigInt range: hi - lo overflows Long when the domain spans more than
    // half the long line (lo near Long.MinValue, hi positive) — the naive
    // subtraction went negative, width collapsed to 1, and the pass-2
    // histogram collect became unbounded (driver OOM) instead of nBins
    // rows. Width is exact for ANY long domain and capped at Long.MaxValue
    // (one all-covering bin is still correct, just unrefined).
    val width = ((BigInt(hi) - BigInt(lo)) / nBins + 1)
      .max(1).min(BigInt(Long.MaxValue)).toLong
    // floorDiv bins ALIGNED AT MULTIPLES OF WIDTH, not offset by lo:
    // `(v - lo) div width` re-introduces the same subtraction overflow
    // inside the expression (silently wrapping, non-monotonic bins).
    // floorDiv(v, width) never overflows, stays monotonic, and spans at
    // most nBins + 1 buckets over [lo, hi]. True integer division
    // (Column./ on longs is DOUBLE division, whose half-ulp rounding could
    // flip a value across a bin boundary at 2^50-range quotients); the
    // CASE term converts Spark's truncating `div` into floor division.
    def binOf: Column = expr(
      s"(v div ${width}L) + (CASE WHEN v < 0 AND v % ${width}L != 0 " +
        "THEN -1 ELSE 0 END)")
    // pass 2: fixed-width histogram; nBins rows to the driver — bounded
    // cardinality by construction (the annotated-collect contract)
    val hist = v.groupBy(binOf.as("bin"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val cumBefore = hist.scanLeft(0L)(_ + _._2).init
    // fold each target rank k to (bin, residual rank within bin)
    val targets = quantilesBp.sorted.map { p =>
      val k = 1L + p.toLong * (n - 1L) / 10000L
      val i = hist.indices.find(i => cumBefore(i) < k && k <= cumBefore(i) + hist(i)._2).get
      (p, k, hist(i)._1, k - cumBefore(i))
    }
    // pass 3: refine ONLY the target bins — the bin ranges push down to
    // the scan as value-range filters; the within-bin sort is partitioned
    // by bin (never an unpartitioned window)
    // bin b covers [b·width, (b+1)·width − 1] under floorDiv; boundaries
    // computed in BigInt and clamped into the long line (a straddling
    // boundary clamps to MinValue/MaxValue — every long passes, still
    // exact) so b·width cannot overflow either
    def clampLong(x: BigInt): Long =
      x.max(BigInt(Long.MinValue)).min(BigInt(Long.MaxValue)).toLong
    val binFilter = targets.map { case (_, _, b, _) =>
      $"v" >= clampLong(BigInt(b) * width) &&
        $"v" <= clampLong(BigInt(b) * width + width - 1)
    }.reduce(_ || _)
    val want = targets.toDF("p_bp", "rank", "tbin", "kb")
    v.where(binFilter)
      .withColumn("bin", binOf)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"bin").orderBy($"v")))
      .join(broadcast(want), $"bin" === $"tbin" && $"rn" === $"kb")
      .select($"p_bp", $"rank", $"v".as("value"))
      .orderBy($"p_bp")
  }
}
