package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{QuotaSampler, TfIdf}

/** Round-9 pipeline operators: quota sampling (aggregator ≡ window),
  * BM25 ranking properties, repetition filter's shuffle-free plan. */
class PipelineOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("QuotaSampler ≡ the window row_number path, ties included") {
    // three groups of different sizes; duplicate texts INSIDE a group force
    // identical md5 prefixes, so the id tie-break is load-bearing
    val docs = (0L until 40L).map { i =>
      val grp = s"src${i % 3}"
      val text = if (i % 7 == 0) "tied text" else s"doc body $i"
      (grp, i, text)
    }.toDF("source", "doc_id", "text")

    val agg = QuotaSampler.sample(docs, "source", "doc_id", "text", 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    val win = docs
      .select($"source", $"doc_id", substring(md5($"text"), 1, 12).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
      .where($"rk" <= 5)
      .select($"source", $"rk", $"doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    assert(win.toSeq == agg.toSeq)
    // every group fills its quota (all groups have > 5 members)
    assert(agg.map(_._1).groupBy(identity).values.forall(_.length == 5))
  }

  test("QuotaSampler keeps whole undersized groups") {
    val docs = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 3L, "z"))
      .toDF("source", "doc_id", "text")
    val out = QuotaSampler.sample(docs, "source", "doc_id", "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(2))).sorted
    assert(out.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("BM25: rarity wins at equal tf; length normalization demotes") {
    // 'rare' appears in 1 of 4 docs, 'common' in all — at tf=1 each in
    // doc 0, the rare term must outrank the common one
    // pads appear in a second doc so df(pad)=2 > df(rare)=1 > nothing,
    // df(common)=4: strict rarity order rare > pad0 > common in doc 0
    val docs = Seq(
      (0L, "rare common pad0 pad1"),
      (1L, "common pad0 pad1 filler2"),
      (2L, "common filler3 filler4 filler5"),
      (3L, "common filler6 filler7 filler8"))
      .toDF("doc_id", "text")
    val top = TfIdf.bm25TopTerms(docs, "doc_id", "text", 4)
      .where($"id" === 0).orderBy($"rank")
      .collect().map(r => (r.getString(2), r.getDouble(6)))
    assert(top.head._1 == "rare", s"expected 'rare' first, got ${top.toSeq}")
    val byTerm = top.toMap
    assert(byTerm("rare") > byTerm("pad0") && byTerm("pad0") > byTerm("common"))

    // same tf, same df: the term sitting in a LONGER doc scores lower
    // (that's the b·dl/avgdl denominator term tf-idf lacks)
    val lenDocs = Seq(
      (0L, "target short"),
      (1L, "target alonger doc with many more tokens than short"))
      .toDF("doc_id", "text")
    val scores = TfIdf.bm25TopTerms(lenDocs, "doc_id", "text", 10)
      .where($"term" === "target")
      .collect().map(r => (r.getLong(0), r.getDouble(6))).toMap
    assert(scores(0L) > scores(1L), s"length norm missing: $scores")
  }

  test("repetition filter plans zero shuffle exchanges (map-only)") {
    // per-row array expressions mean the only exchange in the physical
    // plan is the final orderBy's range partitioning — a corpus-sized
    // input never hash-shuffles
    val dir = "/root/testdata/sf0.001"
    val plan = graft.queries.Analytics.q83RepetitionFilter(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash shuffle in q83 plan:\n$plan")
    val kept = graft.queries.Analytics.q83RepetitionFilter(spark, dir)
    val rows = kept.collect()
    assert(rows.nonEmpty)
    // ratio bounds + kept consistency on real data
    rows.foreach { r =>
      val (n, u, ratio, k) =
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))
      assert(u <= n && u >= 1)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(k == (u.toDouble / n >= 0.55))
    }
  }
}
