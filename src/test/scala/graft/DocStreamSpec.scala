package graft

import graft.streaming.DocStream

/** Incremental near-dup admission: in-batch dedup, cross-batch dedup
  * against the accumulated index, distinct docs always admitted. */
class DocStreamSpec extends SparkSpec {
  import sqlImplicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today ok"
  private val neardup =
    "the quick brown fox jumps over the lazy dog again and again tonight ok"
  private val other =
    "completely different content about spark query engines and shuffles here"
  private val third =
    "a totally unrelated document discussing benchmarks and storage formats"

  test("admitBatch: in-batch min-id wins; cross-batch rejects vs index") {
    val index = tmpDir("doc-index") + "/idx"
    // batch 1: near-dup pair inside the batch → min id admitted; plus one
    // distinct doc
    val b1 = Seq((5L, base), (9L, neardup), (7L, other)).toDF("doc_id", "text")
    val a1 = DocStream.admitBatch(spark, b1, index).collect()
      .map(_.getLong(0)).sorted
    assert(a1.toSeq == Seq(5L, 7L))

    // batch 2: near-dup of an ALREADY-ADMITTED doc is rejected across
    // batches; a genuinely new doc is admitted
    val b2 = Seq((20L, neardup), (21L, third)).toDF("doc_id", "text")
    val a2 = DocStream.admitBatch(spark, b2, index).collect()
      .map(_.getLong(0)).sorted
    assert(a2.toSeq == Seq(21L))

    // batch 3: exact re-delivery of everything → nothing admitted
    val b3 = Seq((30L, base), (31L, other), (32L, third)).toDF("doc_id", "text")
    assert(DocStream.admitBatch(spark, b3, index).count() == 0)
  }

  test("streaming run: two waves through the same index") {
    val staging = tmpDir("doc-staging")
    val index = tmpDir("doc-index2") + "/idx"
    val out = tmpDir("doc-out")
    Seq((5L, base), (9L, neardup)).toDF("doc_id", "text")
      .write.json(s"$staging/w1")
    DocStream.run(spark, s"$staging/w1", index, out, tmpDir("doc-ckpt1"))
    Seq((20L, neardup), (21L, third)).toDF("doc_id", "text")
      .write.json(s"$staging/w2")
    DocStream.run(spark, s"$staging/w2", index, out, tmpDir("doc-ckpt2"))
    val admitted = spark.read.parquet(out).collect()
      .map(_.getLong(0)).sorted
    assert(admitted.toSeq == Seq(5L, 21L))
  }
}
