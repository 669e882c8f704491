package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Semantics tests for the dedup + similarity operators on crafted inputs
  * with known answers. */
class DedupSimilaritySpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and shuffles here"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 0
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val got = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L)))
  }

  test("fingerprint dedup ≡ exact dedup, and carries key-derived columns") {
    val withLen = docs.withColumn("n_tok", size(split($"text", " ")))
    val got = Dedup.exactByFingerprint(withLen, "text", "doc_id",
        carry = Seq("n_tok"))
      .select("doc_id", "copies", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.map(x => (x._1, x._2)).toSeq ==
      Seq((0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L)))
    assert(got.find(_._1 == 0L).get._3 == 13) // canonical text's count
  }

  test("ngram jaccard finds the near-dup and exact-dup pairs") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id1", "id2", "jaccard_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
    val exact = got.find(p => p._1 == 0L && p._2 == 3L).get
    assert(exact._3 == 1000000) // identical docs → jaccard 1
  }

  test("cross-doc span coverage: interval union of shared sliding windows") {
    // doc 0: 10 tokens; tokens 0-5 ("a b c d e f") reappear verbatim in
    // doc 1 at an UNALIGNED offset — three overlapping shared 4-gram
    // starts (0, 1, 2) whose interval union covers tokens 0..5 = 6.
    // doc 2 repeats a 4-gram TWICE within itself only → not cross-doc.
    // doc 3 is too short for any window.
    val docs = Seq(
      (0L, "a b c d e f p q r s"),
      (1L, "x y a b c d e f z w"),
      (2L, "k l m n o k l m n o"),
      (3L, "u v")
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocSpanCoverage(docs, "doc_id", "text", n = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(0L) == (10L, 3L, 6L, 600000L), s"doc0: ${got(0L)}")
    assert(got(1L) == (10L, 3L, 6L, 600000L), s"doc1: ${got(1L)}")
    assert(got(2L) == (10L, 0L, 0L, 0L), "in-doc repeats are not cross-doc")
    assert(got(3L) == (2L, 0L, 0L, 0L), "short docs report zero coverage")
  }

  test("minhash LSH finds the same pairs as exact jaccard at high threshold") {
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 3, numPerms = 64, bands = 16, threshold = 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("simhash: identical docs at hamming 0; near-dups close; distinct far") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)))
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("connected components: long chain, reliable-checkpoint mode, bounded storage") {
    // chain 0-1-2-...-63 (worst case for label propagation), plus a separate
    // triangle and a singleton-pair: 3 clusters
    val chain = (0L until 63L).map(i => (i, i + 1))
    val extra = Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val pairs = (chain ++ extra).toDF("id1", "id2")
    val expect = ((0L to 63L).map(_ -> 0L) ++
      Seq(100L -> 100L, 101L -> 100L, 102L -> 100L, 200L -> 200L, 201L -> 200L)).toSet

    val before = spark.sparkContext.getPersistentRDDs.size
    val local = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local == expect)
    // superseded per-round checkpoints are reclaimed: a ~7-round run must
    // not leave a persisted RDD per round behind (result + slack allowed;
    // unpersist is async)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 4, s"persisted RDDs grew $before -> $after")

    // reliable checkpoint-dir mode: identical clusters
    val reliable = Dedup.connectedComponents(pairs,
      checkpointDir = Some(tmpDir("cc-ckpt")), reliableInterval = 2,
      smallGraphThreshold = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == expect)

    // every-round reliable (interval=1): the regression case where reliable
    // checkpointing re-executed the observed plan, XORing each edge hash
    // twice and collapsing the convergence fingerprint to (2n, 0, 0)
    val ckptDir = tmpDir("cc-ckpt-all")
    val allReliable = Dedup.connectedComponents(pairs,
      checkpointDir = Some(ckptDir), reliableInterval = 1,
      smallGraphThreshold = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allReliable == expect)
    // superseded reliable rounds must have deleted their checkpoint files;
    // at most the final round's copy may remain
    val leftover = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
    assert(leftover <= 1, s"$leftover reliable checkpoint dirs leaked")
  }

  test("reliableInterval > 1 keeps the durable anchor alive through local rounds") {
    // A local-only round must not delete the preceding reliable round's
    // checkpoint files — they are the only durable copy in the system
    // while the interval elapses (the pre-fix code freed them immediately,
    // making every interval > 1 equivalent to local-only mode). The hook
    // fires between rounds: whenever the system is mid-interval, the
    // checkpoint dir must still hold at least one rdd-* snapshot.
    val chain = (0L until 60L).map(i => (i, i + 1))
    val ckptDir = tmpDir("cc-anchor")
    var violations = 0
    val check = (_: Int) => {
      val present = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      if (present == 0) violations += 1
    }
    val got = Dedup.connectedComponentsWithHook(chain.toDF("id1", "id2"), 30,
      Some(ckptDir), 3, 0L, check).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L to 60L).map(_ -> 0L).toSet)
    assert(violations == 0,
      s"$violations rounds left NO reliable files on disk mid-interval")
  }

  test("reliable CC mode survives loss of every executor-local block between rounds") {
    // The failure reliable checkpointing exists for: executor storage wiped
    // between rounds. unpersist(blocking) on a lineage-truncated
    // localCheckpoint IS block loss — there is no lineage left to recompute
    // from. In reliable mode every long-lived frame (pair source, nodes,
    // seed edges, rounds, result) is file-backed, so the loop must converge
    // to the same clusters anyway.
    val chain = (0L until 40L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((100L, 101L))).toDF("id1", "id2")
    val expect = ((0L to 40L).map(_ -> 0L) ++
      Seq(100L -> 100L, 101L -> 100L)).toSet
    val evict = (_: Int) => spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val got = Dedup.connectedComponentsWithHook(pairs, 30,
      Some(tmpDir("cc-evict")), 1, 0L, evict).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // contrast — the local-only path cannot recover from the same loss,
    // which is exactly why the reliable mode exists
    intercept[org.apache.spark.SparkException] {
      Dedup.connectedComponentsWithHook(pairs, 30, None, 1, 0L, evict)
        .collect()
    }
  }

  test("posting-list cap bounds mega-bucket candidate cost") {
    // Adversarial input: hundreds of identical short docs put one value in
    // every band bucket — uncapped, the band self-join forms n²/2 candidate
    // pairs; capped, the mega-buckets are dropped and only the distinct
    // near-dup pair (whose buckets stay small) survives.
    val mega = (0L until 300L).map(i => (i, "spam spam spam spam"))
    val distinctPair = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1001L, "the quick brown fox jumps over the lazy dog again and again tonight"))
    val adversarial = (mega ++ distinctPair).toDF("doc_id", "text")

    val uncapped = Dedup.simhashNearDupPairs(adversarial, "doc_id", "text", 3)
      .count()
    assert(uncapped >= 300L * 299 / 2) // the quadratic blowup is real
    val capped = Dedup.simhashNearDupPairs(adversarial, "doc_id", "text", 3,
      maxBucket = 50)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1000L, 1001L)))

    val cappedMinhash = Dedup.minhashLshPairs(adversarial, "doc_id", "text",
      shingleSize = 3, numPerms = 64, bands = 16, threshold = 0.5,
      maxBucket = 50)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cappedMinhash.toSeq == Seq((1000L, 1001L)))
  }

  test("brute-force knn: exact ordering on crafted vectors") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),  // closest to 0
      (2L, Seq(0.5f, 0.5f, 0.0f)),  // second
      (3L, Seq(0.0f, 0.0f, 1.0f))   // orthogonal
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("id") === 0L, k = 3)
      .select("rank", "nid").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("LSH ANN: results are a subset of brute-force with consistent ranks") {
    val emb = (0L until 40L).map { i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("id") < 3, 5).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", dim = 8,
      col("id") < 3, 5).select("qid", "nid", "sim").collect()
    assert(lsh.nonEmpty)
    // every LSH hit must be a true neighbor pair with the same sim the
    // brute-force path computes (exact rerank)
    val bruteAll = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("id") < 3, 40).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lsh.foreach { r =>
      assert(bruteAll((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("MMR diverse top-k: redundancy penalized, plain top-k reordered") {
    // query 0 at the x-axis; 1 and 2 are NEAR-COPIES of each other close
    // to it (mutual cosine ≈ 0.999); 3 is moderately relevant in a
    // DIFFERENT direction (cos to 1 ≈ 0.735). Plain top-3 by cosine is
    // (1, 2, 3); MMR at λ=50 picks 1, then 3 (2's similarity to the
    // already-selected 1 makes its marginal score negative), then 2.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.98f, 0.199f, 0f, 0f)),
      (2L, Seq(0.97f, 0.243f, 0f, 0f)),
      (3L, Seq(0.75f, 0f, 0.6614f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrDiverseTopK(emb, "vec_id", "embedding",
        queryPred = col("id") === 0, shortlist = 3, k = 3, lambdaPct = 50)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L), s"got $got")
    // sanity: plain relevance order differs (2 beats 3 on raw cosine)
    val plain = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryPred = col("id") === 0, k = 3)
      .orderBy(col("rank")).collect().map(_.getLong(2)).toSeq
    assert(plain == Seq(1L, 2L, 3L), s"plain $plain")
  }

  test("embedding near-dup pairs: threshold filters correctly") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.99f, 0.01f)), (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      dim = 2, 0.9, lit(true)).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)))
  }

  test("blocked fuzzy pairs: edit-distance verify inside blocks only") {
    val recs = Seq(
      (0L, "acme corp ltd"),
      (1L, "acme corpp ltd"),   // 1 insertion from 0
      (2L, "acme co ltd"),      // 2 edits from 0 ("rp" dropped)
      (3L, "acme totally different name"),
      (4L, "acne corp ltd")     // 1 sub from 0 — but block "acne" ≠ "acme"
    ).toDF("doc_id", "text")
    val toks = split($"text", " ")
    val got = graft.operators.Dedup.blockedFuzzyPairs(recs, "doc_id",
        blockCol = element_at(toks, 1),
        nameCol = concat_ws(" ", slice(toks, 1, 3)), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    // 0-1 at dist 1, 0-2 at dist 2, 1-2 at dist 2 (corpp→co: 3 edits? no:
    // corpp→co = 3 deletions → dist 3, filtered); 4 is unreachable across
    // the block boundary even though its true distance to 0 is 1 — the
    // recall loss blocking trades for Σ(block²) cost, pinned here
    assert(got.toSeq == Seq((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("semantic dedup: drops higher-id near-dups within a cell only") {
    // 1 and 5 duplicate 0 (same direction, scaled / near-exact); md5
    // seed order for ids 0..5 is 5,3,1,0,4,2 → K=2 seeds are {5, 3}, so
    // cell 5 = {0,1,4,5} and cell 3 = {2,3} (mutually non-dup there)
    val emb = Seq(
      (0L, Seq(1.0f, 0.02f, 0.0f)),
      (1L, Seq(0.98f, 0.02f, 0.0f)),  // near-dup of 0
      (2L, Seq(-1.0f, 0.0f, 0.9f)),   // opposite half-space
      (3L, Seq(0.0f, -1.0f, 0.2f)),   // seed of 2's cell, orthogonal to 2
      (4L, Seq(0.0f, 1.0f, 0.0f)),    // orthogonal to 0 — same cell, kept
      (5L, Seq(0.5f, 0.011f, 0.0f))   // scaled copy of 0 → cos ≈ 1
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
        scale = 1000000L, targetCell = 3, minK = 2, thresholdPct = 90)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(0L) == (0L, true))       // lowest id of its dup set
    assert(got(1L)._2 == false)         // dup of 0 in the same cell
    assert(got(5L)._2 == false)         // scale-invariant: cosine, not L2
    assert(got(5L)._1 == 2L)            // both 0 and 1 sit below it
    assert(got(2L)._2 && got(3L)._2)    // cellmates but orthogonal
    assert(got(4L)._2)                  // cellmate of 0 but orthogonal
    // exactly the two planted dups drop
    assert(got.values.count(!_._2) == 2)
  }

  test("semantic dedup: adaptive K keeps the expected cell bounded") {
    // 600 vectors, targetCell 64 → K = ceil(600/64) = 10 cells; every
    // vector is assigned and no cell exceeds a loose multiple of target
    val emb = (0 until 600).map { i =>
      val a = i * 0.7071; (i.toLong, Seq(math.cos(a).toFloat,
        math.sin(a).toFloat, math.cos(2 * a).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
      scale = 1000000L, targetCell = 64, minK = 8, thresholdPct = 99)
    assert(got.count() == 600)
    val cells = got.groupBy("cid").count().collect()
    assert(cells.length == 10)
  }

  test("fused MMR trajectory ≡ reference greedy replay (r17 fusion gate)") {
    // 40 vectors on a 3-sphere spiral, 3 queries, shortlist 9, k 6 — wide
    // enough that rounds disagree if the fused aggregate's filter/penalty/
    // tie-break drifts from the spec'd greedy recurrence. The reference
    // replays the selection in plain Scala from the SAME brute-force sims
    // (identical ppm rounding), so any divergence is in the fused
    // selection expression itself.
    val emb = (0 until 40).map { i =>
      val a = i * 0.37
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
        math.cos(3 * a).toFloat, math.sin(5 * a).toFloat))
    }.toDF("vec_id", "embedding")
    val k = 6; val shortlist = 9; val lambdaPct = 70
    val got = Similarity.mmrDiverseTopK(emb, "vec_id", "embedding",
        queryPred = col("id") < 3, shortlist = shortlist, k = k,
        lambdaPct = lambdaPct)
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getLong(1), r.getLong(3))).toMap
    // reference: brute-force shortlist + exact pairwise sims in Scala
    def ppm(x: Double): Long = math.round(x * 1e6)
    val vecs = (0 until 40).map { i =>
      val a = i * 0.37
      val v = Seq(math.cos(a).toFloat.toDouble, math.sin(a).toFloat.toDouble,
        math.cos(3 * a).toFloat.toDouble, math.sin(5 * a).toFloat.toDouble)
      i.toLong -> v
    }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0L until 3L).foreach { q =>
      val rel = vecs.keys.filter(_ != q).toSeq
        .map(n => n -> ppm(cos(vecs(q), vecs(n))))
        .sortBy { case (n, s) => (-s, n) }.take(shortlist)
      var sel = Vector.empty[(Long, Long)] // (nid, score)
      (1 to k).foreach { r =>
        val remaining = rel.filterNot(c => sel.exists(_._1 == c._1))
        if (remaining.nonEmpty) {
          val scored = remaining.map { case (nid, rl) =>
            val pen = sel.map { case (s, _) =>
              ppm(cos(vecs(nid), vecs(s))) }.maxOption.getOrElse(0L)
            (nid, lambdaPct.toLong * rl - (100L - lambdaPct) * pen)
          }
          val pick = scored.minBy { case (nid, sc) => (-sc, nid) }
          sel = sel :+ pick
          assert(got((q, r)) == pick,
            s"q=$q round=$r: fused ${got((q, r))} != reference $pick")
        }
      }
    }
  }
}
