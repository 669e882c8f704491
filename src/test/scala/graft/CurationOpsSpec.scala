package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}
import graft.queries.Analytics

/** Round-9 curation operators: PII redaction ordering, chunk-level
  * keep-first dedup, length-bucket boundaries, sharded training order. */
class CurationOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("co-occurrence pmi: +1/+2 window pairs, exact ppm ratio, tie order") {
    // five identical docs: every windowed pair fires 5× with flat unigrams
    // → pmi_ppm = trunc(5·20·10⁶ / (5·5)) = 4,000,000 for all five pairs
    val docs = (0 until 5).map(i => (i.toLong, "alpha beta x y"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pmi").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.q105CooccurPmi(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("alpha", "beta", 5L, 4000000L), ("alpha", "x", 5L, 4000000L),
      ("beta", "x", 5L, 4000000L), ("beta", "y", 5L, 4000000L),
      ("x", "y", 5L, 4000000L)))
  }

  test("robust scale: nearest-rank percentiles off the millibin histogram") {
    // dim 0: 1..4 (n=4 → k25=1, k50=2, k75=3 → 0.001, 0.002, 0.003);
    // dim 1: all-equal values collapse into ONE bin yet keep rank mass
    val emb = Seq(
      (0L, Seq(0.001f, 0.5f)), (1L, Seq(0.002f, 0.5f)),
      (2L, Seq(0.003f, 0.5f)), (3L, Seq(0.004f, 0.5f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("robust").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Analytics.q102RobustScale(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(got(0) == (1L, 4L, 1L, 2L, 3L, 2L))
    assert(got(1) == (500L, 500L, 500L, 500L, 500L, 0L))
  }

  test("inverted index: df/cf exact, postings tf-desc with doc tiebreak") {
    val spark0 = spark
    val docs = Seq(
      (1L, "x x x y"),        // tf(x)=3
      (2L, "x y y"),          // tf(x)=1, tf(y)=2
      (3L, "x x z"),          // tf(x)=2
      (4L, "x q"), (5L, "x q"), (6L, "x q") // tf(x)=1 ties → doc order
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("invidx").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.q99InvertedIndex(spark0, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // only x reaches df >= 5; postings: doc1 tf3, doc3 tf2, then the
    // tf-1 tie resolves to the lowest doc (2)
    assert(got.keySet == Set("x"))
    assert(got("x") == (6L, 9L, "1:3,3:2,2:1"))
  }

  test("canonicalizeUrl folds every variant axis to one key") {
    val urls = Seq(
      "https://www.site.example/p/3",      // scheme + www
      "http://site.example/p/3/",          // trailing slash
      "https://site.example/p/3?utm_source=feed&ref=a", // tracking only
      "http://www.site.example/p/3/?utm_campaign=x",    // slash-before-?
      "https://site.example/p/3?id=7",     // real param survives
      "https://site.example/p/3?utm_x=1&id=7", // tracking before real
      "https://site.example/p/3/?id=7"     // slash folds into real query
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = urls
      .select($"id", TextFunctions.canonicalizeUrl($"url").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).map(got).toSet == Set("site.example/p/3"))
    assert(Seq(4L, 5L, 6L).map(got).toSet == Set("site.example/p/3?id=7"))
  }

  test("redactPii scrubs every pattern and applies email before IP") {
    val rows = Seq(
      "write to alice.smith+x@corp.example thanks",
      "server at 10.23.161.9 answered",
      "call 555-0042 or 555-9999 now",
      // the load-bearing ordering case: the email's domain IS an IPv4-
      // looking dotted run — redacting IP first would leave a half-eaten
      // 'bob@[IP].net' that the email pattern can no longer match
      "bob@10.0.0.1.net pinged",
      "no pii here at all").toDF("s")
    val out = rows.select(TextFunctions.redactPii($"s").as("r"))
      .as[String].collect()
    assert(out(0) == "write to [EMAIL] thanks")
    assert(out(1) == "server at [IP] answered")
    assert(out(2) == "call [PHONE] or [PHONE] now")
    assert(out(3) == "[EMAIL] pinged")
    assert(out(4) == "no pii here at all")
    // nothing PII-shaped survives any redacted string
    val residue = rows.select(TextFunctions.redactPii($"s").as("r"))
      .where(regexp_count($"r", lit(TextFunctions.emailRe)) > 0 ||
        regexp_count($"r", lit(TextFunctions.ipv4Re)) > 0 ||
        regexp_count($"r", lit(TextFunctions.phoneRe)) > 0)
    assert(residue.count() == 0)
  }

  test("chunk dedup keeps first occurrence by (doc_id, pos), once per owner") {
    val w = (0 until 8).map(i => s"w$i").mkString(" ") // one 8-token chunk
    val x = (0 until 8).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (10L, s"$w $x"),     // owns both chunks
      (11L, s"$x $w"),     // both are dups of doc 10
      (12L, s"$w $w"),     // intra-doc repeat of a foreign chunk: 2 dups
      (13L, "short text")) // < 8 tokens — no chunks, dropped
      .toDF("doc_id", "text")
    val dir = tmpDir("chunkdedup")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Analytics.q85ChunkDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (10L, 2, 2, 0),        // owner of w and x
      (11L, 2, 0, 1000000),  // all dups
      (12L, 2, 0, 1000000))) // both occurrences of w are dups
  }

  test("length buckets sit on exact power-of-two boundaries") {
    def doc(n: Int) = (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))
    val docs = Seq(doc(16), doc(17), doc(32), doc(33), doc(64))
      .toDF("doc_id", "text")
    val dir = tmpDir("lenbuckets")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Analytics.q86LengthBuckets(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    // 16 → bucket 16 (zero waste); 17 and 32 → bucket 32; 33 and 64 → 64
    assert(out.toSeq == Seq(
      (16, 1L, 16L, 16L, 0),
      (32, 2L, 49L, 64L, (15L * 1000000L / 64L).toInt),
      (64, 2L, 97L, 128L, (31L * 1000000L / 128L).toInt)))
  }

  test("shardAssign ≡ one row_number window per shard, any bucket layout") {
    val docs = (0L until 300L).map(i => (i, s"body $i"))
      .toDF("doc_id", "text")
    val twin = docs
      .select($"doc_id", PortableHash.md5Head60(
        concat(lit("shuf:"), $"doc_id".cast("string"))).as("k"))
      .withColumn("shard", ($"k" % 8).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy($"shard").orderBy($"k", $"doc_id")).cast("int"))
      .select($"doc_id", $"shard", $"pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val out = Analytics.shardAssign(docs, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(out.toSeq == twin.toSeq)
    // positions are a dense 1..n permutation inside every shard
    val byShard = out.groupBy(_._2)
    assert(byShard.values.forall(s =>
      s.map(_._3).sorted.toSeq == (1 to s.length).toSeq))
  }

  test("q127 ladder: quality, exact and semantic stages each claim their doc") {
    // 12 quality-passing survivors (0..11) — adaptive K = minK = 8, and
    // the md5 'sem:' draw over 0..11 seeds exactly {0,1,3,5,7,8,9,11}.
    // Doc 4 is NOT a seed and its embedding is colinear with seed 3's
    // (orthogonal to every other seed), so it lands in cell 3 at cosine
    // ≈ 1 → semantic_dup. Doc 12 repeats doc 0's text → exact_dup; doc
    // 13 is spanish-majority → quality_drop; docs 0 and 7 (id % 7 == 0)
    // get re-crawl clones, which must land exact_dup under min-id keep.
    val enText = "the cat a dog the fish a bird the cow a hen the ox a ram " +
      "the sun a moon the star a sky the tree a leaf the root a stem"
    val docs = ((0L until 12L).map(i => (i, s"$enText u$i")) ++ Seq(
      (12L, s"$enText u0"),
      (13L, "data table data table data table data table")
    )).toDF("doc_id", "text")
    def basis(pos: Int, v: Float) =
      (0 until 16).map(j => if (j == pos) v else 0.0f)
    val emb = (0L until 12L).map { i =>
      if (i == 4L) (i, basis(3, 0.999999f)) else (i, basis(i.toInt, 1.0f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ladder").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.Curation.q127CurationPass(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 16) // 14 corpus docs + clones of 0 and 7
    assert(got(4L) == "semantic_dup")    // cosine ≈ 1 vs lower-id seed 3
    assert(got(12L) == "exact_dup")      // same text as doc 0, higher id
    assert(got(13L) == "quality_drop")
    // clone ids ride max(doc_id)+1 = 14 (ADVICE r12: no fixed offset to
    // collide with real ids), so clones of 0 and 7 land at 14 and 21
    assert(got(14L) == "exact_dup")      // re-crawl clone of doc 0
    assert(got(21L) == "exact_dup")      // re-crawl clone of doc 7
    assert((0L until 12L).filter(_ != 4L).forall(got(_) == "kept"))
  }

  test("sparse cosine retrieval ≡ BigInt brute force; df-capped candidates") {
    // doc 4 shares ONLY the over-cap term 'a' (df 4 > maxDf 3) with the
    // query -> excluded by design even though its cosine is positive;
    // doc 5 shares nothing. Docs 1/2/3 qualify via b (df 2) or c (df 3).
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), (2L, "c d"),
      (3L, "a c"), (4L, "a x"), (5L, "y z")
    ).toDF("doc_id", "text")
    val got = graft.operators.TfIdf.sparseCosineTopK(
        docs, "doc_id", "text", queryPred = col("id") === 0, k = 5,
        maxDf = 3L, idfScale = 10000L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // brute force with exact BigInt arithmetic, identical weight recipe
    val corpus = Seq(0L -> "a b c", 1L -> "a b", 2L -> "c d",
      3L -> "a c", 4L -> "a x", 5L -> "y z")
    val tf = corpus.map { case (id, t) =>
      id -> t.split(' ').groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val w = tf.view.mapValues(_.map { case (t, f) =>
      t -> BigInt(f * (10000L / dfreq(t))) }.toMap).toMap
    val n2 = w.view.mapValues(_.values.map(x => x * x).sum).toMap
    def dot(a: Long, b: Long): BigInt =
      w(a).keySet.intersect(w(b).keySet).toSeq
        .map(t => w(a)(t) * w(b)(t)).sum
    val cands = (1L to 5L).filter { n =>
      tf(0L).keySet.intersect(tf(n).keySet)
        .exists(t => dfreq(t) >= 2 && dfreq(t) <= 3)
    }
    val expected = cands
      .map(n => n -> (dot(0L, n) * dot(0L, n) * 1000000 / (n2(0L) * n2(n))).toLong)
      .sortBy { case (n, s) => (-s, n) }
      .zipWithIndex.map { case ((n, s), i) => (0L, i + 1, n, s) }
    assert(got.sortBy(_._2).toSeq == expected)
    assert(!got.exists(_._3 == 4L), "over-cap-only doc 4 must be absent")
    assert(got.length == 3)
  }

  test("stored inverted index: search ≡ inline; stale corpus rebuilds") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), (2L, "c d"),
      (3L, "a c"), (4L, "a x"), (5L, "y z")
    ).toDF("doc_id", "text")
    val idx = new graft.sources.TextIndex(spark, tmpDir("tidx") + "/t")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val stored = rows(graft.operators.TfIdf.sparseSearchStored(
      docs, "doc_id", "text", queryPred = col("id") === 0, k = 5,
      index = idx, maxDf = 3L))
    val inline = rows(graft.operators.TfIdf.sparseCosineTopK(
      docs, "doc_id", "text", queryPred = col("id") === 0, k = 5,
      maxDf = 3L))
    assert(stored.nonEmpty && stored == inline)
    // a grown corpus must fail the fingerprint and rebuild: the new doc
    // shifts df('a') so even old pairs' scores change
    val grown = docs.unionByName(Seq((6L, "a q")).toDF("doc_id", "text"))
    val after = rows(graft.operators.TfIdf.sparseSearchStored(
      grown, "doc_id", "text", queryPred = col("id") === 0, k = 5,
      index = idx, maxDf = 4L))
    val afterInline = rows(graft.operators.TfIdf.sparseCosineTopK(
      grown, "doc_id", "text", queryPred = col("id") === 0, k = 5,
      maxDf = 4L))
    assert(after == afterInline && after != stored)
  }

  test("sparse retrieval: maxscore pruning is score-safe (on ≡ off)") {
    // A corpus where the prune actually FIRES: queries share one strong
    // rare term with their true neighbors and only weak/common terms with
    // the rest, k = 1 so θ (the best lower bound) is high and the weak
    // candidates' upper bounds fall below it. Safety is structural (a
    // pruned pair's true score is strictly below the k-th best — see the
    // operator scaladoc), but this pins the implementation: identical
    // output rows either way, on a shape where survivors ≠ all.
    val docs = Seq(
      (0L, "alpha beta common1 common2 common3"),
      (1L, "alpha beta common1 common2 common3"), // strong match for 0
      (2L, "gamma common1 common2 common3"),      // weak candidates: only
      (3L, "gamma delta common1 common2 common3"), // chained rare overlaps
      (4L, "delta epsilon common1 common2 common3"),
      (5L, "epsilon zeta common1 common2 common3"),
      (6L, "zeta eta common1 common2 common3")
    ).toDF("doc_id", "text")
    def run(p: Boolean) = graft.operators.TfIdf.sparseCosineTopK(
        docs, "doc_id", "text", queryPred = col("id") < 2, k = 1,
        maxDf = 2L, prune = p)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val off = run(false)
    val on = run(true)
    assert(off.nonEmpty && on == off,
      s"pruning changed the ranking: on=$on off=$off")
  }

  test("q138 fusion: rrf recomposes from the two constituent rankings") {
    // run the hybrid AND its two branches standalone on the real sf0.001
    // tables; every fused score must equal the recomputed coalesced
    // 10^6 div (60 + rank) sum, including single-list candidates
    val dir = "/root/testdata/sf0.001"
    val dense = graft.operators.Similarity.ivfTopK(
        graft.sources.Tables(spark, dir, "embeddings"), "vec_id",
        "embedding", nCentroids = 16, nProbe = 14,
        queryPred = col("id") < 8, k = 5, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val sparse = graft.operators.TfIdf.sparseCosineTopK(
        graft.sources.Tables(spark, dir, "documents"), "doc_id", "text",
        queryPred = col("id") < 8, k = 5, maxDf = 400L)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val fused = graft.queries.Curation.q138HybridRrf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(fused.nonEmpty)
    fused.foreach { case (qid, _, nid, rrf) =>
      val expect = dense.get((qid, nid)).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        sparse.get((qid, nid)).map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == expect, s"($qid, $nid): $rrf != $expect")
    }
    // the fixture must exercise BOTH single-list paths or the coalesce
    // arms are untested
    val pairs = fused.map(t => (t._1, t._3)).toSet
    assert(pairs.exists(p => dense.contains(p) && !sparse.contains(p)))
    assert(pairs.exists(p => sparse.contains(p) && !dense.contains(p)))
  }

  test("q139 negatives: same cell, disjoint from top-5, never the anchor") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables(spark, dir, "embeddings")
    val top5 = graft.operators.Similarity.ivfTopK(emb, "vec_id", "embedding",
        nCentroids = 16, nProbe = 14, queryPred = col("id") < 8, k = 5,
        portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val cellOf = graft.operators.Similarity.ivfAssignments(emb, "vec_id",
        "embedding", nCentroids = 16, portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val negs = graft.queries.Curation.q139HardNegatives(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(negs.nonEmpty)
    negs.foreach { case (qid, _, nid, cid) =>
      assert(nid != qid, s"anchor $qid listed as its own negative")
      assert(!top5((qid, nid)), s"($qid, $nid) is a top-5 positive")
      assert(cellOf(nid) == cid && cellOf(qid) == cid,
        s"($qid, $nid) not cell-confined")
    }
    // ≤3 per anchor, ranks dense from 1
    negs.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length) && g.length <= 3)
    }
  }

  test("q142 split: no near-dup cluster ever straddles two splits") {
    // recompute per-doc assignments with the engine's own pieces and
    // assert the leakage guarantee directly (the catalog readout only
    // exposes the rollup), plus totals consistency with the rollup
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id").as("id"))
    val cc = graft.operators.Dedup.connectedComponents(
      Analytics.blockEdges(docs))
    val perDoc = docs.join(cc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), col("id")).as("cluster"))
      .withColumn("b", pmod(PortableHash.md5Head60(
        concat(lit("split:"), col("cluster").cast("string"))), lit(10L)))
      .withColumn("split", when(col("b") < 8, "train")
        .when(col("b") === 8, "val").otherwise("test"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // the guarantee: one split per cluster
    perDoc.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster ${members.head._2} straddles splits")
    }
    // a multi-doc cluster must exist or the guarantee is vacuous here
    assert(perDoc.groupBy(_._2).values.exists(_.size > 1))
    val rollup = graft.queries.Curation.q142LeakageSafeSplit(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = perDoc.groupBy(_._3).map { case (s, m) =>
      s -> (m.size.toLong, m.map(_._2).distinct.size.toLong)
    }
    assert(rollup == expect)
  }

  test("q131 attribution: last touch only, within the 3600s window") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq(
      // user 1: view at t=0, click at t=100, purchase at t=200 → click
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(100), 1L, "click", 0.0, "{}"),
      (3L, ts(200), 1L, "purchase", 10.0, "{}"),
      // user 2: view at t=0, purchase at t=4000 → stale touch → none
      (4L, ts(0), 2L, "view", 0.0, "{}"),
      (5L, ts(4000), 2L, "purchase", 20.0, "{}"),
      // user 3: purchase with no prior events at all → none; an earlier
      // PURCHASE must not become a touch for the later one
      (6L, ts(50), 3L, "purchase", 30.0, "{}"),
      (7L, ts(60), 3L, "purchase", 40.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Curation.q131Attribution(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("click", 1L, 1000L), ("none", 3L, 9000L)))
  }

  test("q132 pareto: dominated points drop, same-price collapses to max") {
    val parts = Seq(
      // brand A: (1.00, 5) frontier; (1.00, 3) collapsed away;
      // (2.00, 7) frontier; (3.00, 6) dominated by (2.00, 7)
      ("A", 1.00, 5), ("A", 1.00, 3), ("A", 2.00, 7), ("A", 3.00, 6),
      // brand B: equal size at higher price is dominated (strict test)
      ("B", 1.50, 4), ("B", 2.50, 4)
    ).zipWithIndex.map { case ((b, p, sz), i) =>
      (i.toLong, s"part$i", b, "t", sz, p)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("pareto").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = graft.queries.Curation.q132ParetoFrontier(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("A", 100L, 5), ("A", 200L, 7), ("B", 150L, 4)))
  }

  test("q128 priority sampling is deterministic and weight-biased") {
    // two strata; within 'big' one doc carries 100× the weight of the
    // rest — its priority h/w shrinks ~100×, so it must sample in
    val docs = ((0L until 40L).map(i => (i, "s0", 100L)) ++
      (100L until 140L).map(i => (i, "s1", if (i == 120L) 10000L else 100L)))
      .map { case (id, src, w) => (id, "t", "en", src, w) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("prio").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val a = graft.queries.Curation.q128PrioritySample(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val b = graft.queries.Curation.q128PrioritySample(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq) // deterministic — no RNG state anywhere
    assert(a.count(_._1 == "s0") == 10 && a.count(_._1 == "s1") == 10)
    assert(a.exists(t => t._1 == "s1" && t._3 == 120L),
      "the 100x-weight doc must be sampled")
  }
}
