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
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    // document frequency FROM tf, not from the raw token stream: tf already
    // holds exactly one row per (doc, term), so df is a plain count — this
    // avoids a second tokenize+explode scan of the corpus and turns a
    // corpus-wide count_distinct shuffle into a partial-aggregatable count
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
}
