package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Recall floors for the three no-oracle operators (q23/q25/q39), measured
  * against exact in-engine truth on the real sf0.001 tables with the SAME
  * parameters the catalog queries use — the hard check the rows-only
  * CORRECTNESS gate can't provide.
  */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables(spark, dir, "embeddings")
  private def docs = graft.sources.Tables(spark, dir, "documents")

  private def hitSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // both hash families: default xxhash64 (the scale path) AND portable md5
  // (what q25/q39 run in the catalog since the oracle flip) — a portable
  // plane grid or seed set with degraded recall would pass the hash-match
  // (the oracle replays the same buckets) yet return worse neighbors
  for (portable <- Seq(false, true)) {
    val mode = if (portable) "portable" else "xxhash64"

    test(s"q25 LSH ANN ($mode): recall >= 0.9 vs brute-force at catalog parameters") {
      val truth = hitSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("id") < 8, k = 5))
      val got = hitSet(Similarity.lshTopK(emb, "vec_id", "embedding", dim = 64,
        col("id") < 8, k = 5, tables = 21, bitsPerTable = 3,
        portable = portable))
      val recall = (truth & got).size.toDouble / truth.size
      assert(recall >= 0.9, s"LSH recall $recall < 0.9 (${(truth -- got).size} missed)")
    }

    test(s"q39 IVF ANN ($mode): recall >= 0.9 vs brute-force at catalog parameters") {
      val truth = hitSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("id") < 8, k = 5))
      val got = hitSet(Similarity.ivfTopK(emb, "vec_id", "embedding",
        nCentroids = 16, nProbe = 14, col("id") < 8, k = 5,
        portable = portable))
      val recall = (truth & got).size.toDouble / truth.size
      assert(recall >= 0.9, s"IVF recall $recall < 0.9 (${(truth -- got).size} missed)")
    }
  }

  test("q31 LSH-banded cosine near-dup == brute-force pairs at catalog parameters") {
    // the derived banding's miss probability at sim = threshold is <= 1e-6
    // and the plane grid is fixed, so this is a deterministic equality, not
    // a flaky sample: the candidate set must cover every true pair
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(Similarity.cosineNearDupPairsBrute(
      emb, "vec_id", "embedding", 0.4, col("vec_id") < 256))
    val banded = pairSet(Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", dim = 64, 0.4, col("vec_id") < 256))
    assert(banded === brute,
      s"missed ${brute -- banded}, extra ${banded -- brute}")
    assert(brute.nonEmpty, "fixture has no near-dup pairs — vacuous test")
  }

  test("near-dup banding derivation follows the S-curve budget") {
    // high threshold -> wide tables / few of them; low -> narrow but many;
    // always within the 64-bit signature and the 1e-6 miss budget
    Seq(0.0, 0.4, 0.8, 0.95).foreach { t =>
      val (b, l) = Similarity.nearDupBanding(t)
      assert(b * l <= 64, s"t=$t: $b*$l exceeds the signature")
      val p = 1.0 - math.acos(t) / math.Pi
      val miss = math.pow(1.0 - math.pow(p, b), l)
      assert(miss <= 1e-6, s"t=$t: miss $miss over budget at ($b, $l)")
    }
    val (bLow, _) = Similarity.nearDupBanding(0.4)
    val (bHigh, _) = Similarity.nearDupBanding(0.95)
    assert(bHigh > bLow, "higher threshold must afford wider tables")
  }

  test("q73 refined IVF: recall >= 0.9 vs brute-force at catalog parameters") {
    val truth = hitSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("id") < 8, k = 5))
    val got = hitSet(Similarity.ivfTopK(emb, "vec_id", "embedding",
      nCentroids = 16, nProbe = 12, col("id") < 8, k = 5, kmeansIters = 2))
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.9,
      s"refined IVF recall $recall < 0.9 (${(truth -- got).size} missed)")
  }

  test("IVF k-means refinement: tighter cells raise recall on clustered data") {
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    // 4 well-separated clusters of 30 vectors in 16 dims: each member is its
    // cluster's one-hot-ish center plus a small deterministic perturbation
    val emb = (0L until 120L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(16) { j =>
        val center = if (j / 4 == c) 1.0f else 0.0f
        center + 0.05f * math.sin(i * 3.1 + j * 1.7).toFloat
      })
    }.toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("id") < 4, k = 5).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(iters: Int): Double = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding",
        nCentroids = 4, nProbe = 1, col("id") < 4, k = 5,
        kmeansIters = iters).select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val seedRecall = recallAt(0)
    val refinedRecall = recallAt(3)
    assert(refinedRecall >= seedRecall,
      s"refinement degraded recall: $seedRecall -> $refinedRecall")
    assert(refinedRecall >= 0.9,
      s"refined single-probe recall $refinedRecall < 0.9 on separable clusters")
  }

  test("minhash banding S-curve: recall ≈ 1 just above τ = 0.8 at 16×4; 4×16 would collapse") {
    import sqlImplicits._
    // Planted pairs with EXACT shingle jaccard via prefix truncation: doc A
    // is 102 unique tokens (100 trigram shingles), doc B its first p tokens
    // — B's shingles are A's first p-2, so J = (p-2)/100 exactly. Each pair
    // gets its own token universe (cross-pair J = 0). 7 replicas at each of
    // J ∈ {0.78, 0.80, 0.82} straddle the catalog's τ = 0.8; 3 distractor
    // pairs at J = 0.30 sit far down the S-curve.
    val plants = (for {
      (j, reps) <- Seq((78, 7), (80, 7), (82, 7), (30, 3))
      r <- 0 until reps
    } yield (j, r)).zipWithIndex
    val docs = plants.flatMap { case ((j, _), i) =>
      val toks = (0 until 102).map(t => s"u${i}t$t")
      Seq((2L * i, toks.mkString(" ")),
        (2L * i + 1, toks.take(j + 2).mkString(" ")))
    }.toDF("doc_id", "text")
    val planted = plants.map { case ((j, _), i) => (2L * i, 2L * i + 1, j) }

    def foundAt(bands: Int): Set[(Long, Long)] =
      Dedup.minhashLshPairs(docs, "doc_id", "text", shingleSize = 3,
        numPerms = 64, bands = bands, threshold = 0.7)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val got16 = foundAt(16)
    val boundary = planted.filter(_._3 >= 78).map(p => (p._1, p._2))
    val recall = boundary.count(got16).toDouble / boundary.size
    // 16 bands × 4 rows: P[candidate] = 1-(1-J^4)^16 ≥ 0.999 at J ≥ 0.78
    assert(recall >= 0.9, s"boundary recall $recall at 16×4 banding")
    // verification bounds what banding lets through: nothing below τ' = 0.7,
    // nothing across universes
    assert(got16.subsetOf(planted.map(p => (p._1, p._2)).toSet))
    assert(!planted.filter(_._3 == 30).map(p => (p._1, p._2)).exists(got16))

    // the S-curve pin proper: wider bands (4×16 rows) put the same pairs at
    // P[candidate] ≈ 0.09–0.16 — a banding regression fails THIS assert
    // loudly instead of silently eroding near-τ recall
    val got4 = foundAt(4)
    val recall4 = boundary.count(got4).toDouble / boundary.size
    assert(recall4 < 0.5,
      s"4×16 banding found $recall4 of boundary pairs — S-curve fixture is broken")
  }

  test("q23 simhash bands: every exact Hamming<=3 pair is found (recall 1)") {
    // 4 bands of 16 bits pigeonhole any <=3-bit difference into at least one
    // untouched band, so band-bucketing must surface EVERY such pair; the
    // operator's exact verify then keeps exactly the true ones. Truth is the
    // full pairwise Hamming computation on the driver (500 docs at sf0.001).
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (idA, hA) <- sh; (idB, hB) <- sh
      if idA < idB && java.lang.Long.bitCount(hA ^ hB) <= 3
    } yield (idA, idB)).toSet
    val got = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture produced no exact pairs — test is vacuous")
    assert(got == truth,
      s"missed ${(truth -- got).size} exact pairs, ${(got -- truth).size} spurious")
  }

  test("simhash banding derived from maxHamming keeps recall 1 beyond h=3") {
    // 6 bands for h=5: the old fixed 4-band split only guaranteed h <= 3.
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (idA, hA) <- sh; (idB, hB) <- sh
      if idA < idB && java.lang.Long.bitCount(hA ^ hB) <= 5
    } yield (idA, idB)).toSet
    val got = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(got == truth,
      s"missed ${(truth -- got).size} exact pairs, ${(got -- truth).size} spurious")
  }

  test("idRadix guards: empty corpus -> empty result, not a plan-time NPE") {
    // ADVICE r12: the decimal-packing radix job max(id) returns a NULL
    // slot on an empty (or all-null-embedding) input; the old getLong
    // NPE'd at PLAN time where the lazy plan would have produced an
    // empty frame
    import sqlImplicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(empty, "vec_id", "embedding",
      nCentroids = 4, nProbe = 2, col("id") < 2, k = 3).count() == 0L)
    assert(Similarity.kmeansStepFixedPoint(empty, "vec_id", "embedding",
      nCentroids = 4, scale = 1000000L).count() == 0L)
  }

  test("idRadix guards: negative ids fail fast instead of corrupting argmin") {
    // (M-1-cid) past the radix flips the sign of pd % M — a silently
    // WRONG winner; the guard turns the bad fixture into a loud error
    import sqlImplicits._
    val neg = Seq((-1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(neg, "vec_id", "embedding",
        nCentroids = 2, nProbe = 1, col("id") < 2, k = 1)
    }
    assert(ex.getMessage.contains("non-negative"), ex.getMessage)
  }
}
