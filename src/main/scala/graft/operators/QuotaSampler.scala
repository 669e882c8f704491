package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Scored, TopKAggregator}

/** Per-group quota sampling — the domain-balancing step of a pretraining
  * mixture (cap every source/domain at N documents, chosen deterministically
  * so reruns and engines agree).
  *
  * Selection rule: within each group keep the `quota` rows ranking lowest by
  * (48-bit md5 prefix of the text, id) — a deterministic pseudo-random
  * permutation requiring no RNG state, the same portable-md5 membership trick
  * the stratified sampler uses (q54).
  *
  * Scale design: the naive form is a `row_number` window over the group —
  * at 100 TB each group is a fat sorted partition (20 sources ⇒ 20 tasks own
  * the corpus). This routes through the k-bounded typed
  * [[graft.functions.TopKAggregator]] instead: partial (map-side) aggregation
  * keeps an O(quota) buffer per group per partition, so the shuffle carries
  * quota·partitions rows per group — never the corpus — and the group count
  * (not the corpus size) bounds the reduce side. The 48-bit prefix fits a
  * double exactly (< 2^53), so the aggregator's (score desc, id asc) order
  * realizes (hash asc, id asc) via negation, matching the oracle's
  * fixed-width lowercase-hex string order.
  */
object QuotaSampler {

  def sample(docs: DataFrame, groupCol: String, idCol: String,
             textCol: String, quota: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val keyed = docs.select(
      col(groupCol).as("grp"),
      col(idCol).cast("long").as("id"),
      // conv() parses the 12 lowercase-hex chars to a 48-bit long; exact in
      // a double, so the typed aggregator can rank on its negation
      -conv(substring(md5(col(textCol)), 1, 12), 16, 10)
        .cast("long").cast("double").as("nh"))
    val topk = new TopKAggregator(quota).toColumn
    keyed.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(topk)
      .flatMap { case (grp, hits) =>
        hits.zipWithIndex.map { case (s, i) => (grp, i + 1, s.id) }
      }
      .toDF("grp", "rank", "id")
  }
}
