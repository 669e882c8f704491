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

  test("memoized UTF8String entry point is bit-identical to the bytes path") {
    // the per-token hot path carries a per-thread direct-mapped memo; this
    // hammers one thread with repeats (hits), fresh keys (misses), and
    // slot-collision evictions, checking every answer against a fresh digest
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    val vocab = Array.fill(512)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    (0 until 20000).foreach { _ =>
      val s = vocab(rnd.nextInt(vocab.length))
      assert(PortableHashKernel.md5Head60(UTF8String.fromString(s)) ===
        PortableHashKernel.md5Head60(s.getBytes("UTF-8")), s)
    }
    // a key whose backing buffer is mutated after the call must not poison
    // the memo (the kernel clones defensively). To catch a non-cloning bug
    // the mutated content must land in the SAME memo slot as the original,
    // so search for a same-length string that collides on the slot index.
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def slot(s: String) =
      (XXH64.hashUTF8String(UTF8String.fromString(s), 0L) & ((1 << 15) - 1)).toInt
    val orig = "aaaa"
    val alpha = ('0' to '9') ++ ('b' to 'z') // 35^4 candidates, none == orig
    val collider = Iterator.from(0).take(35 * 35 * 35 * 35).map { i =>
      new String(Array(alpha(i % 35), alpha(i / 35 % 35),
        alpha(i / (35 * 35) % 35), alpha(i / (35 * 35 * 35))))
    }.find(c => slot(c) == slot(orig))
    collider match {
      case Some(c) =>
        val buf = orig.getBytes("UTF-8")
        PortableHashKernel.md5Head60(UTF8String.fromBytes(buf)) // store
        System.arraycopy(c.getBytes("UTF-8"), 0, buf, 0, buf.length)
        // without a defensive clone the stored key now reads `c`, the
        // lookup hits, and the stale md5(orig) value comes back
        assert(PortableHashKernel.md5Head60(UTF8String.fromBytes(buf)) ===
          PortableHashKernel.md5Head60(c.getBytes("UTF-8")), s"collider $c")
      case None =>
        fail("no 4-char slot collider among 35^4 candidates (p < 1e-20)")
    }
    // oversized keys are computed correctly but never pinned in the memo
    // (the memo holds keys for the thread's lifetime — a bound keeps a
    // pathological no-separator corpus from pinning MBs per slot)
    val big = "z" * 5000
    (0 until 2).foreach { _ =>
      assert(PortableHashKernel.md5Head60(UTF8String.fromString(big)) ===
        PortableHashKernel.md5Head60(big.getBytes("UTF-8")))
    }
  }

  test("memo slot-count knob: default 32k, power-of-two floor, bad values fall back") {
    // -Dgraft.portableHash.memoSlots=N is read once at class load; this
    // pins the parse so the override is trustworthy on executors where the
    // default's ~8 MB/thread reservation matters
    assert(PortableHashKernel.memoSlots(None) == (1 << 15))
    assert(PortableHashKernel.memoSlots(Some("8192")) == 8192)
    assert(PortableHashKernel.memoSlots(Some(" 10000 ")) == 8192) // floor to 2^13
    assert(PortableHashKernel.memoSlots(Some("1")) == 1)
    assert(PortableHashKernel.memoSlots(Some("0")) == (1 << 15))
    assert(PortableHashKernel.memoSlots(Some("-4")) == (1 << 15))
    assert(PortableHashKernel.memoSlots(Some("junk")) == (1 << 15))
    assert(PortableHashKernel.memoSlots(Some((1 << 25).toString)) == (1 << 15))
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
