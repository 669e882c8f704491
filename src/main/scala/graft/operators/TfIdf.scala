package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** TF-IDF scoring over a document corpus (SURVEY §7.5 text-analysis
  * extension): three partial-aggregatable passes — term frequency per
  * (doc, term), document frequency per term, corpus size — joined on the
  * term (hash-partitioned; the corpus-size scalar broadcasts). Top-k terms
  * per doc ranked by smoothed tf·idf.
  */
object TfIdf {

  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    // tf as a per-row scalar projection (codegen'd TermCounts — a doc's
    // tokens arrive in one row), so the (id, term) relation never
    // exchanges; df aggregates the exploded projection map-side-combined
    // to vocabulary cardinality. See bm25TopTerms for the measured plan
    // this replaces (tf's exchange used to feed multiple consumers with
    // only partial reuse).
    val tf = docs
      .select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.termCounts(
          tokens(col(textCol)))).as("tc"))
      .select(col("id"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(total))
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
          .as("tfidf"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** BM25 top-k terms per doc (Robertson/Sparck Jones; the retrieval-grade
    * upgrade of [[topTerms]]): idf·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Same three partial-aggregatable passes as tf-idf plus a per-doc length
    * join — dl comes from the (doc, term) tf relation (one row per pair, so
    * sum(tf) = token count) rather than a second tokenize scan, and the
    * corpus scalars (N, total tokens) broadcast. Float portability: every
    * input to the score is an exact integer; avgdl enters as the exact
    * integer ratio dl·N/Σdl computed in one double division, so both
    * engines evaluate the identical IEEE expression tree (same class as
    * [[topTerms]]' ln — hash-matched since round 4).
    */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // A doc's tokens arrive in ONE row, so (doc, term, tf) and dl are
    // per-row SCALAR projections (codegen'd TermCounts kernel) — no
    // explode → groupBy(id, term) corpus exchange at all. The old shape
    // shuffled that relation three times at the 100× dir (exchange reuse
    // deduplicated only one of tf's three consumers) plus a fourth
    // exchange joining dl back by id: measured 22 s at 100×, 5.9 s after
    // this rewrite (e: 0.72 → 0.44). Only df (corpus-level, per-term)
    // still aggregates — map-side-combined to vocabulary cardinality —
    // and the top-k window k-bounds its exchange via WindowGroupLimit.
    val toksCol = tokens(col(textCol))
    val perDoc = docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.termCounts(toksCol).as("tcs"),
      size(toksCol).cast("long").as("dl"))
    val exploded = perDoc
      .select(col("id"), col("dl"), explode(col("tcs")).as("tc"))
      .select(col("id"), col("dl"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
    val dfreq = exploded.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = perDoc.agg(sum(col("dl")).as("tot_tok"),
      count(lit(1)).as("n_docs"))
    // dl·N stays integral (exact at any SF: ≤ 2^63 up to ~10^15 doc·tokens)
    // and the length norm is a single double division of exact longs
    val lenNorm = (col("dl") * col("n_docs")) / col("tot_tok")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * lenNorm))
    val scored = exploded
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), col("term"), col("tf"), col("df"), col("dl"),
        score.as("bm25"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("bm25").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        col("dl"), round(col("bm25"), 4).as("bm25"))
  }
}
