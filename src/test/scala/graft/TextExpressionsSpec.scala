package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.TextExpressions

/** The codegen'd MinHash expression must reproduce the lambda composition
  * bit-for-bit (same xxhash64 recipe), so LSH candidates are unchanged. */
class TextExpressionsSpec extends SparkSpec {
  import sqlImplicits._

  test("minhash_signature ≡ lambda composition, including empty arrays") {
    TextExpressions.register(spark)
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m",
      "x y" // fewer tokens than shingle size → empty shingles
    ).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
    val got = df.select(
      call_function("minhash_signature", col("sh"), lit(64)).as("fast"),
      TextFunctions.minhashSignature(col("sh"), 64).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // empty shingle array → all-MaxValue signature (both paths)
    assert(got(2).getSeq[Long](0).forall(_ == Long.MaxValue))
  }
}
