package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization ADC search: degenerate-config exactness, recall
  * floor on the real embeddings, and the integer-rerank contract. */
class PQSpec extends SparkSpec {
  import sqlImplicits._

  /** Exact integer-L2 top-k twin (fixed-point scale 1e6, ties by id). */
  private def bruteIntTopK(emb: DataFrame, nQueries: Int, k: Int) = {
    val q = emb.where($"embedding".isNotNull)
      .select($"vec_id".as("id"),
        transform($"embedding",
          x => round(x.cast("double") * 1000000L).cast("long")).as("qv"))
    val d2 = aggregate(
      zip_with($"qv", $"quv", (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val w = Window.partitionBy($"qid").orderBy($"d2", $"id")
    q.crossJoin(broadcast(
        q.where($"id" < nQueries).select($"id".as("qid"), $"qv".as("quv"))))
      .select($"qid", $"id", d2.as("d2"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"qid", $"rank", $"id", $"d2")
  }

  test("m=1 with a full codebook degenerates to the exact ranking") {
    // every vector becomes its own (whole-vector) centroid, so ADC IS the
    // exact distance — with rerank = k the emitted top-k must equal the
    // brute-force integer-L2 ranking bit for bit
    val vecs = (0L until 30L).map { i =>
      (i, (0 until 8).map(j => (((i * 7 + j * 3) % 11).toDouble - 5) / 10).toArray)
    }.toDF("vec_id", "embedding")
    val pq = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
        m = 1, kCodes = 30, scale = 1000000L,
        queryPred = $"id" < 4, rerank = 3, k = 3)
      .select($"qid", $"rank", $"id", $"d2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val brute = bruteIntTopK(vecs, nQueries = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(pq.sorted.toSeq == brute.sorted.toSeq)
  }

  test("ivfPqTopK: all cells probed + full codebook degenerates to exact") {
    // nProbe = nCells removes the routing approximation and m=1 with a
    // full codebook removes the quantization one — the composition must
    // then equal the brute-force integer-L2 ranking bit for bit
    val vecs = (0L until 30L).map { i =>
      (i, (0 until 8).map(j => (((i * 7 + j * 3) % 11).toDouble - 5) / 10).toArray)
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        nCells = 4, nProbe = 4, m = 1, kCodes = 30, scale = 1000000L,
        queryPred = $"id" < 4, rerank = 3, k = 3)
      .select($"qid", $"rank", $"id", $"d2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val brute = bruteIntTopK(vecs, nQueries = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == brute.sorted.toSeq)
  }

  test("q125 config: recall tracks the probe ratio; rerank distances exact") {
    // the embeddings table is near-random, so 4/16 probed cells bounds
    // recall near nProbe/nCells — the pin is a floor on that expectation
    // plus the exact-rerank contract (the same contract q88 pins)
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        nCells = 16, nProbe = 4, m = 16, kCodes = 16, scale = 1000000L,
        queryPred = $"id" < 8, rerank = 30, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    val brute = bruteIntTopK(emb, nQueries = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val exactByQ = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val gotByQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exactByQ.map { case (q, ex) =>
      gotByQ.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0)
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.15, s"mean recall $mean (per-query: $recalls)")
    val bruteD2 = brute.map(t => (t._1, t._2) -> t._3).toMap
    got.foreach { case (qid, id, d2) =>
      bruteD2.get((qid, id)).foreach(bd2 => assert(bd2 == d2,
        s"rerank d2 $d2 != true $bd2 for ($qid,$id)"))
    }
  }

  test("q88 config holds recall ≥ 0.7 vs exact L2 on the real embeddings") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val pq = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        m = 16, kCodes = 16, scale = 1000000L,
        queryPred = $"id" < 8, rerank = 50, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    val brute = bruteIntTopK(emb, nQueries = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val exactByQ = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pqByQ = pq.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exactByQ.map { case (q, ex) =>
      pqByQ(q).intersect(ex).size.toDouble / ex.size
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall $mean (per-query: $recalls)")
    // rerank contract: every emitted d2 is the TRUE integer distance
    // (cross-checked against the brute map), so ranks are exact within
    // the shortlist
    val bruteD2 = brute.map(t => (t._1, t._2) -> t._3).toMap
    pq.foreach { case (qid, id, d2) =>
      bruteD2.get((qid, id)).foreach(bd2 => assert(bd2 == d2,
        s"rerank d2 $d2 != true $bd2 for ($qid,$id)"))
    }
  }
}
