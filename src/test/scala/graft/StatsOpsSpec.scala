package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, IncrAgg}
import graft.queries.Analytics

/** Round-10 statistics/maintenance operators: covariance arithmetic,
  * hashing-trick bucketing, incremental state merge, triangle census,
  * BPE pair extraction, normalization rules. */
class StatsOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("covariance: hand-computed n·Σxy − Σx·Σy on two planted dims") {
    // dim0 = [1, 3] mb=[1000,3000]; dim1 = [2, 2] mb=[2000,2000]
    // var0_num = 2·(1e6+9e6) − 4000² = 4e6; cov01_num = 2·(2e6+6e6) − 4000·4000 = 0
    val emb = Seq(
      (0L, Seq.fill(16)(0f).updated(0, 1.0f).updated(1, 2.0f)),
      (1L, Seq.fill(16)(0f).updated(0, 3.0f).updated(1, 2.0f))
    ).toDF("vec_id", "embedding")
    val dir = tmpDir("cov")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Analytics.q106Covariance(spark, dir)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(3))).toMap
    assert(got((0, 0)) == 4000000L)
    assert(got((0, 1)) == 0L)
    assert(got((1, 1)) == 0L) // constant dim: zero variance
    assert(got((2, 2)) == 0L)
    assert(got.size == 136) // 16·17/2 upper-triangle pairs
  }

  test("feature hash: occurrences vs distinct docs split per bucket") {
    val docs = Seq(
      (0L, "alpha alpha beta"), // alpha counts 2 occurrences, 1 doc
      (1L, "alpha")
    ).toDF("doc_id", "text")
    val dir = tmpDir("fh")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.q107FeatureHash(spark, dir).collect()
    // alpha and beta land in (deterministic) buckets; totals conserve
    assert(got.map(_.getLong(1)).sum == 4L) // 4 token occurrences
    val bAlpha = (graft.functions.PortableHash.md5Head60(lit("fh:alpha")) % 256)
    val alphaBucket = spark.range(1).select(bAlpha.cast("int")).head.getInt(0)
    val row = got.find(_.getInt(0) == alphaBucket).get
    assert(row.getLong(1) >= 3L && row.getLong(2) == 2L)
  }

  test("incremental state merge ≡ full recompute, avg derived not stored") {
    val rows = Seq(
      ("a", 1, 100L), ("a", 1, 200L), ("a", 2, 50L), ("b", 1, 10L)
    ).toDF("k", "ym", "v")
    val keys = Seq("k", "ym")
    val sums = Map("st_v" -> col("v"))
    // split unevenly: slice1 = first 2 rows, slice2 = rest
    val s1 = IncrAgg.state(rows.where(col("v") >= 100L), keys, sums)
    val s2 = IncrAgg.state(rows.where(col("v") < 100L), keys, sums)
    val merged = IncrAgg.merge(Seq(s1, s2), keys)
      .orderBy(col("k"), col("ym"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(merged.toSeq == Seq(("a", 1, 2L, 300L), ("a", 2, 1L, 50L),
      ("b", 1, 1L, 10L)))
    // three-way merge associates: merging the merge with an empty state
    val empty = IncrAgg.state(rows.where(lit(false)), keys, sums)
    val re = IncrAgg.merge(Seq(s1, s2, empty), keys).orderBy(col("k"), col("ym"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(re.toSeq == merged.toSeq)
  }

  test("triangles: hand-folded 4-node graph, direction/dup/self-loop noise") {
    // undirected set {1-2, 2-3, 1-3, 3-4}: one triangle, wedges (1,3),(1,4),(2,4)
    val edges = Seq(
      (1L, 2L), (2L, 1L), // duplicate in both directions
      (2L, 3L), (3L, 1L), // reversed orientation
      (3L, 4L), (4L, 4L)  // self-loop dropped
    ).toDF("src", "dst").union(Seq((1L, 3L)).toDF("src", "dst"))
    val got = Graphs.triangleStats(edges).head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((4L, 3L, 1L)))
  }

  test("bpe pairs: within-word adjacency only, count-desc tie order") {
    val docs = Seq((0L, "abab ab x")).toDF("doc_id", "text")
    val dir = tmpDir("bpe")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.q110BpePairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "abab" → ab, ba, ab; "ab" → ab; "x" filtered (len<2); no cross-word "bx"
    assert(got.toSeq == Seq(("ab", 3L), ("ba", 1L)))
  }

  test("normalize: case, punctuation, collapse, trim — and exact delta") {
    val docs = Seq((0L, "  Hello,   WORLD!! 42  ")).toDF("doc_id", "text")
    val dir = tmpDir("norm")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.q111Normalize(spark, dir).head
    val norm = "hello world 42"
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getString(1) == exp)
    assert(got.getInt(2) == "  Hello,   WORLD!! 42  ".length - norm.length)
  }
}
