package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** [[Quantiles.exactQuantiles]] — the two-pass selection must equal the
  * full-sort k-th smallest on adversarial inputs (heavy ties, negatives,
  * a 99% duplicate spike), for ANY bin count, including degenerate ones. */
class QuantilesSpec extends SparkSpec {
  import sqlImplicits._

  private val targets = Seq(0, 2500, 5000, 9000, 9900, 10000)

  private def truth(vals: Seq[Long], pBp: Int): (Long, Long) = {
    val sorted = vals.sorted
    val k = 1L + pBp.toLong * (vals.length - 1L) / 10000L
    (k, sorted((k - 1).toInt))
  }

  private def check(vals: Seq[Long], nBins: Int): Unit = {
    val got = Quantiles.exactQuantiles(
        vals.toDF("x"), col("x"), targets, nBins = nBins)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == targets.sorted, s"nBins=$nBins")
    got.foreach { case (p, k, v) =>
      val (tk, tv) = truth(vals, p)
      assert(k == tk && v == tv,
        s"nBins=$nBins p=$p: got (rank $k, $v), truth (rank $tk, $tv)")
    }
  }

  test("exact vs full sort: skewed values, ties, negatives") {
    val vals = (0 until 500).map(i => ((i * 37) % 13).toLong * 100 - 300) ++
      Seq.fill(200)(417L) ++ Seq.fill(50)(-300L)
    check(vals, nBins = 4096)
  }

  test("bin-count invariance, including a single-bin degenerate") {
    val vals = (0 until 300).map(i => (i.toLong * i) % 997)
    Seq(1, 2, 7, 64, 4096).foreach(check(vals, _))
  }

  test("99% one-value spike: the dominant bin still refines exactly") {
    val vals = Seq.fill(990)(5L) ++ (0 until 10).map(i => 1000L + i)
    check(vals, nBins = 16)
  }

  test("full-long-line domain: hi - lo overflow must not collapse width") {
    // lo near Long.MinValue with positive hi: the naive (hi - lo) wraps
    // negative, width collapses to 1, and pass 2 tries to collect ~2^64
    // histogram rows. BigInt width + floorDiv bins keep the histogram at
    // ≤ nBins+1 rows and the answers exact.
    val vals = Seq(Long.MinValue + 7L, -5000000000L, -1L, 0L, 1L,
      42L, 5000000000L, Long.MaxValue - 3L, Long.MaxValue)
    check(vals, nBins = 16)
    check(vals, nBins = 1) // one all-covering bin, width at the Long cap
  }

  test("empty and all-null inputs produce an empty frame") {
    assert(Quantiles.exactQuantiles(
      Seq.empty[Long].toDF("x"), col("x"), Seq(5000)).count() == 0L)
    assert(Quantiles.exactQuantiles(
      Seq[Option[Long]](None, None).toDF("x"), col("x"), Seq(5000))
      .count() == 0L)
  }
}
