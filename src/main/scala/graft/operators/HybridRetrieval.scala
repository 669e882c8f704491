package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid dense + sparse retrieval over STORED indexes — the production
  * serving shape: both arms read prebuilt structures (dense:
  * [[Similarity.ivfSearchStored]] over a [[graft.sources.VectorIndex]];
  * sparse: [[TfIdf.sparseSearchStored]] over a
  * [[graft.sources.TextIndex]]), so the online plan is index scans +
  * keyed joins with NO build stage on either arm (the inline q138 fusion
  * re-derives both indexes per query). Fusion is integer reciprocal-rank
  * (micro units, `1e6 div (rrfK + rank)`, ties by nid) — RRF consumes
  * RANKS only, which is what makes the arms swappable for any other
  * shortlist source without touching the fusion. */
object HybridRetrieval {

  def rrfStored(emb: DataFrame, embIdCol: String, vecCol: String,
                nCentroids: Int, nProbe: Int,
                vIndex: graft.sources.VectorIndex,
                docs: DataFrame, docIdCol: String, textCol: String,
                tIndex: graft.sources.TextIndex, maxDf: Long,
                queryPred: Column, k: Int, rrfK: Int = 60,
                portable: Boolean = false,
                embToken: Option[String] = None,
                docToken: Option[String] = None): DataFrame = {
    val dense = Similarity.ivfSearchStored(emb, embIdCol, vecCol,
        nCentroids, nProbe, queryPred, k, vIndex, portable = portable,
        corpusToken = embToken)
      .select(col("qid"), col("nid"), col("rank").as("dr"))
    val sparse = TfIdf.sparseSearchStored(docs, docIdCol, textCol,
        queryPred, k, tIndex, maxDf, corpusToken = docToken)
      .select(col("qid"), col("nid"), col("rank").as("sr"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_micro").desc, col("nid"))
    dense.join(sparse, Seq("qid", "nid"), "full_outer")
      .select(col("qid"), col("nid"),
        (coalesce(expr(s"1000000 div ($rrfK + dr)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + sr)"), lit(0L)))
          .as("rrf_micro"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("rrf_micro"))
  }
}
