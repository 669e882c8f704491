package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** Z-order layout: the interleave must be bit-exact Morton, and a clusterBy
  * rewrite must actually shrink each file's value rectangle on BOTH columns
  * — that per-file min/max footprint IS what parquet footer stats prune by,
  * so it's the layout's testable claim. */
class ZOrderSpec extends SparkSpec {
  import sqlImplicits._

  /** Reference part1by1: bit i of x → bit 2i, plain loop. */
  private def mortonRef(a: Long, b: Long): Long = {
    def spread(x: Long): Long =
      (0 until 32).map(i => ((x >> i) & 1L) << (2 * i)).reduce(_ | _)
    spread(a & 0xFFFFFFFFL) | (spread(b & 0xFFFFFFFFL) << 1)
  }

  test("zValue is bit-exact Morton interleave on random inputs") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xFFFFFFFFL, 0L), (0L, 0x7FFFFFFFL)) ++
      (1 to 50).map(_ => (rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b), s"a=$a b=$b")
    }
  }

  test("clusterBy shrinks per-file spans on both columns vs a linear sort") {
    val n = 4096
    val rnd = new scala.util.Random(13)
    val df = (1 to n).map(_ => (rnd.nextInt(10000).toLong,
      rnd.nextInt(10000).toLong, rnd.nextInt().toLong))
      .toDF("a", "b", "payload")
    val base = tmpDir("zorder")
    val nFiles = 16

    // linear layout: globally sorted by `a` alone
    df.repartitionByRange(nFiles, $"a").sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrder.clusterBy(df, "a", "b", s"$base/zorder", nFiles)

    def perFileSpans(dir: String, c: String): Seq[Long] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getPath.toString)
            .agg(min(col(c)), max(col(c))).collect()(0)
          r.getLong(1) - r.getLong(0)
        }.toSeq
    }
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)

    // same data either way
    assert(spark.read.parquet(s"$base/zorder").count() == n)
    assert(spark.read.parquet(s"$base/zorder").agg(sum($"payload"))
      .collect()(0).getLong(0) ==
      df.agg(sum($"payload")).collect()(0).getLong(0))

    // linear layout: `b` spans ~the full domain in every file; z-order
    // caps BOTH medians well below it. (A 16-cell z-curve over a 10k×10k
    // space gives each file a rectangle ~quarter-domain per side; 0.6 is a
    // loose, non-flaky bound — linear's b-span median sits near 10000.)
    val linB = median(perFileSpans(s"$base/linear", "b"))
    val zA = median(perFileSpans(s"$base/zorder", "a"))
    val zB = median(perFileSpans(s"$base/zorder", "b"))
    assert(zB < (linB * 0.6).toLong,
      s"z-order b-span median $zB not < 0.6×linear $linB")
    assert(zA < 6000, s"z-order a-span median $zA")
    assert(zB < 6000, s"z-order b-span median $zB")
  }
}
