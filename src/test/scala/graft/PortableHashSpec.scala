package graft

import org.apache.spark.sql.functions._

import graft.plans.PortableHashKernel

/** Pins the three twins of the portable 60-bit hash against each other and
  * against externally computed goldens — the whole q23/q25/q39 oracle story
  * rests on these producing the same bits as DuckDB's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  */
class PortableHashSpec extends SparkSpec {

  // goldens computed with an independent md5 implementation (python
  // hashlib): int(md5(s)[:15], 16) — catches byte-order / off-by-a-nibble
  // regressions that twin-equality alone would miss
  private val goldens = Seq(
    "hp:0:0" -> 271483719535441462L,
    "hello"  -> 419982666956583591L,
    ""       -> 955282973525019424L,
    "über"   -> 603625850609523170L)

  test("kernel md5Head60 matches external md5 goldens (incl. empty, UTF-8)") {
    goldens.foreach { case (s, want) =>
      assert(PortableHashKernel.md5Head60(s) === want, s)
    }
  }

  test("Column twin (conv∘substring∘md5) is bit-identical to the kernel") {
    import sqlImplicits._
    val df = goldens.map(_._1).toDF("s")
      .select(col("s"),
        graft.functions.PortableHash.md5Head60(col("s")).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === PortableHashKernel.md5Head60(r.getString(0)),
        r.getString(0))
    }
  }

  test("md5Signed recenters into [-1000002, 1000002] and matches the formula") {
    goldens.foreach { case (s, h60) =>
      val v = PortableHashKernel.md5Signed(s)
      assert(v === (h60 % 2000005L) - 1000002L, s)
      assert(v >= -1000002L && v <= 1000002L, s)
    }
    assert(PortableHashKernel.md5Signed("hp:0:0") === 839395L)
  }

  test("portable SimHash64: one manual recomputation, and codegen == eval") {
    import sqlImplicits._
    graft.plans.TextExpressions.register(spark)
    val text = "the quick brown fox jumps over the lazy dog"
    // manual: per-token md5Head60 bit votes, strictly-positive rule
    val votes = new Array[Int](64)
    text.split(" ", -1).foreach { tok =>
      val h = PortableHashKernel.md5Head60(tok)
      (0 until 64).foreach { b =>
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
      }
    }
    val want = (0 until 64).foldLeft(0L) { (acc, b) =>
      if (votes(b) > 0) acc | (1L << b) else acc
    }
    assert((want >>> 60) === 0L, "bits 60-63 must be clear for a 60-bit hash")
    val df = Seq(text).toDF("text")
      .select(call_function("simhash64_portable", split(col("text"), " "))
        .as("sh"))
    // projecting the kernel directly: a janino compile failure throws here
    // instead of silently falling back to interpreted (the round-5 lesson)
    assert(df.collect().head.getLong(0) === want)
    val expr = graft.plans.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        text.split(" ", -1).toSeq,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      portable = true)
    assert(expr.eval(null) === want, "interpreted eval must match codegen")
  }

  test("portable HyperplaneSig weights follow the md5Signed grid recipe") {
    import sqlImplicits._
    val dim = 4
    val v = Seq((1L, Seq(0.3, -0.7, 0.2, 0.9))).toDF("id", "v")
    val got = v.select(graft.functions.VectorFunctions
        .hyperplaneSignature(col("v"), dim, nbits = 8, portable = true)
        .as("sig"))
      .collect().head.getLong(0)
    val vec = Array(0.3, -0.7, 0.2, 0.9)
    var want = 0L
    (0 until 8).foreach { p =>
      var acc = 0.0
      (0 until dim).foreach { d =>
        acc += vec(d) *
          (PortableHashKernel.md5Signed(s"hp:$p:$d").toDouble / 1000003.0)
      }
      if (acc > 0) want |= 1L << p
    }
    assert(got === want)
  }
}
