package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.VectorExpressions

/** The codegen'd vector kernels must agree exactly with the lambda
  * composition (same summation order) and handle nulls/zero norms. */
class VectorExpressionsSpec extends SparkSpec {
  import sqlImplicits._

  test("dot_product / cosine_sim match the zip_with/aggregate composition bit-for-bit") {
    VectorExpressions.register(spark)
    val df = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(16)(j => math.sin(i * 3.7 + j)),
        Seq.tabulate(16)(j => math.cos(i * 1.3 + j)))
    }.toDF("id", "a", "b")
    val got = df.select(
      call_function("dot_product", $"a", $"b").as("dfast"),
      VectorFunctions.dot($"a", $"b").as("dref"),
      call_function("cosine_sim", $"a", $"b").as("cfast"),
      (VectorFunctions.dot($"a", $"b") /
        (VectorFunctions.l2Norm($"a") * VectorFunctions.l2Norm($"b"))).as("cref"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bitwise equality
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("cosine_sim: zero-norm vector yields NULL; null input yields NULL") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(1.0, 0.0))
    ).toDF("a", "b")
    val got = df.select(call_function("cosine_sim", $"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 1.0)
    val withNull = df.select(
      call_function("cosine_sim", lit(null).cast("array<double>"), $"b")).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("hyperplane_sig ≡ transform/zip_with/aggregate composition") {
    val df = (0L until 50L).map { i =>
      i -> Seq.tabulate(16)(j => math.sin(i * 2.7 + j * 1.3))
    }.toDF("id", "v")
    val got = df.select($"id",
        graft.functions.VectorFunctions.hyperplaneSignature($"v", 16, 63).as("fast"),
        graft.functions.VectorFunctions
          .hyperplaneSignatureComposed($"v", 16, 63).as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    // signatures are non-degenerate (not all equal)
    assert(got.map(_.getLong(1)).distinct.length > 10)
    // wrong-length vector → 0, like the composition's null-padded zip_with
    val short = Seq(Seq(1.0, 2.0)).toDF("v").select(
      graft.functions.VectorFunctions.hyperplaneSignature($"v", 16, 63).as("s"),
      graft.functions.VectorFunctions
        .hyperplaneSignatureComposed($"v", 16, 63).as("r")).collect().head
    assert(short.getLong(0) == 0L && short.getLong(0) == short.getLong(1))

    // NaN projections: Spark's NaN > 0 is TRUE — every bit set, both paths
    val nan = Seq(Seq.fill(16)(Double.NaN)).toDF("v").select(
      graft.functions.VectorFunctions.hyperplaneSignature($"v", 16, 63).as("s"),
      graft.functions.VectorFunctions
        .hyperplaneSignatureComposed($"v", 16, 63).as("r")).collect().head
    assert(nan.getLong(0) == nan.getLong(1))
    assert(nan.getLong(0) == (1L << 63) - 1)

    // null ELEMENT nulls the products → signature 0, both paths
    val withNullElem = spark.sql(
      "SELECT array(CAST(NULL AS DOUBLE)" + ", 1.0D" * 15 + ") AS v")
    val ne = withNullElem.select(
      graft.functions.VectorFunctions.hyperplaneSignature($"v", 16, 63).as("s"),
      graft.functions.VectorFunctions
        .hyperplaneSignatureComposed($"v", 16, 63).as("r")).collect().head
    assert(ne.getLong(0) == 0L && ne.getLong(1) == 0L)

    // DELIBERATE divergence: NULL input → NULL (composition produced 0,
    // landing null-embedding rows in bucket 0 of every LSH table)
    val nullVec = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS v").select(
      graft.functions.VectorFunctions.hyperplaneSignature($"v", 16, 63).as("s"))
      .collect().head
    assert(nullVec.isNullAt(0))
  }

  test("long_dot / long_sq_dist match the lambda composition exactly") {
    VectorExpressions.register(spark)
    val df = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(16)(j => (i * 37L + j * j - 8)),
        Seq.tabulate(16)(j => (i * 13L - j * 5)))
    }.toDF("id", "a", "b")
    val got = df.select(
      call_function("long_dot", $"a", $"b").as("dfast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("dref"),
      call_function("long_sq_dist", $"a", $"b").as("sfast"),
      aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("sref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
    // common-prefix semantics on length mismatch, like the double kernels
    val mix = Seq((Seq(2L, 3L, 100L), Seq(4L, 5L))).toDF("a", "b")
    val m = mix.select(call_function("long_dot", $"a", $"b"),
      call_function("long_sq_dist", $"a", $"b")).collect().head
    assert(m.getLong(0) == 23L && m.getLong(1) == 8L)
  }

  test("double_sort_key: signed-long order ≡ Spark's double order") {
    VectorExpressions.register(spark)
    // adversarial ladder: -Inf < most-negative < -1 < -ε < ±0 < ε < 1 <
    // most-positive < +Inf < NaN (Spark's NaN-greatest ordering). -0.0 and
    // 0.0 both sit strictly between every negative and every positive —
    // their relative order is the documented, unobservable divergence.
    val ladder = Seq(Double.NegativeInfinity, -1.7976931348623157e308,
      -1.0, -4.9e-324, -0.0, 0.0, 4.9e-324, 1.0,
      1.7976931348623157e308, Double.PositiveInfinity, Double.NaN)
    val keys = ladder.zipWithIndex.toDF("x", "i")
      .select($"i", call_function("double_sort_key", $"x").as("k"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    // strictly ascending except the ±0 adjacency (ascending there too,
    // just not required to be)
    keys.sliding(2).zipWithIndex.foreach { case (pair, i) =>
      assert(pair(0) < pair(1),
        s"key order broke between ladder[$i]=${ladder(i)} " +
          s"and ladder[${i + 1}]=${ladder(i + 1)}: ${pair(0)} >= ${pair(1)}")
    }
    // the packed-argmax contract the kernel exists for: for random pairs,
    // key comparison must agree with java.lang.Double.compare
    val rnd = new scala.util.Random(7)
    val doubles = Array.fill(200)(rnd.nextDouble() * 2 - 1)
    def key(d: Double): Long = {
      val bits = java.lang.Double.doubleToLongBits(d)
      bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
    }
    for (a <- doubles.take(40); b <- doubles.take(40))
      assert(Integer.signum(java.lang.Long.compare(key(a), key(b))) ==
        Integer.signum(java.lang.Double.compare(a, b)))
  }

  test("kernel participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    // a range source so ConvertToLocalRelation can't pre-evaluate the project
    val df = spark.range(100)
      .select(transform(sequence(lit(0), lit(7)), j => ($"id" + j).cast("double")).as("a"),
        transform(sequence(lit(0), lit(7)), j => ($"id" * j).cast("double")).as("b"))
      .select(call_function("dot_product", $"a", $"b").as("d"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "dot_product fell out of codegen")
  }
}
