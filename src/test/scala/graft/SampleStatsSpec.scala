package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** Round-10 curation/statistics operators: substring-window duplication,
  * weighted systematic sampling, exact-sum OLS, distribution drift,
  * schema profiling, mergeable percentile state. */
class SampleStatsSpec extends SparkSpec {
  import sqlImplicits._

  private def docsDir(prefix: String, rows: Seq[(Long, String)]): String = {
    val dir = tmpDir(prefix)
    rows.map { case (id, tx) => (id, tx, "en", "web", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("window dup: planted shared passage flags both owners, not the unique doc") {
    // 60 normalized chars -> 2 windows each (stride 20, width 40)
    val shared = "the quick brown fox jumps over a lazy dog again and again ok"
      .take(60)
    val unique = "zero one two three four five six seven eight nine ten elevens"
      .take(60)
    assert(shared.length == 60 && unique.length == 60)
    val dir = docsDir("windup", Seq(
      (0L, shared), (1L, shared), (2L, unique), (3L, "short text")))
    val got = Analytics.q112WindowDup(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(got(0L) == ((2, 2)) && got(1L) == ((2, 2)))
    assert(got(2L) == ((2, 0)))
    assert(!got.contains(3L)) // sub-window doc contributes no windows
  }

  test("systematic sample: equals the brute-force line walk; one pick per step") {
    // 300 docs, weights 1..3 -> total 600, step 6: most docs are skipped
    // and no interval can contain two ticks (w < step)
    val rows = (0L until 300L).map(i => (i, Seq.fill(((i % 3) + 1).toInt)("w")
      .mkString(" ")))
    val dir = docsDir("syssample", rows)
    val got = Analytics.q113SystematicSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // brute-force replay: md5 order, cumulative weights, total/100 step
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"sys:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val line = rows.map { case (id, tx) => (h(id), id, tx.split(" ").length.toLong) }
      .sortBy(t => (t._1, t._2))
    val total = line.map(_._3).sum
    val step = math.max(total / 100L, 1L)
    var cb = 0L
    val want = line.flatMap { case (_, id, w) =>
      val pick = (cb + w) / step > cb / step
      val tick = ((cb + w) / step).toInt
      cb += w
      if (pick) Some((id, w.toInt, tick)) else None
    }.sortBy(_._1)
    assert(step == 6L)
    assert(got.toSeq == want)
    assert(got.length == (total / step).toInt) // every step claimed once
    assert(got.length < rows.length) // and most docs skipped
    assert(got.map(_._3).distinct.length == got.length)
  }

  test("ols: hand-computed slope/intercept/r2 on planted groups") {
    val dir = tmpDir("ols")
    val rows = Seq(
      ("A", 1.0, 1.00), ("A", 2.0, 2.00), ("A", 3.0, 3.00), // y = 100x cents
      ("B", 1.0, 1.00), ("B", 2.0, 4.00), ("B", 3.0, 5.00), ("B", 4.0, 8.00))
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Analytics.q114Ols(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("A") == ((3L, 100000000L, 0L, 1000000L)))
    // B: num=4400, den=20 -> slope 220 c/unit; icept -100 c; r2 = 0.968
    assert(got("B") == ((4L, 220000000L, -100000000L, 968000L)))
  }

  test("tv drift: exact cross-multiplied numerators and ppb total") {
    val dir = docsDir("tvd", Seq((0L, "a a b"), (1L, "a b b c")))
    val got = Analytics.q115TvDrift(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    // N0=3 N1=4: a |2*4-1*3|=5, c |0*4-1*3|=3, b |1*4-2*3|=2; tvd=10/24
    assert(got.map(t => (t._1, t._2._1, t._2._2, t._2._3)).toSeq ==
      Seq(("a", 2L, 1L, 5L), ("c", 0L, 1L, 3L), ("b", 1L, 2L, 2L)))
    assert(got.forall(_._2._4 == 416666666L))
  }

  test("profile: nulls, distincts, and min/max reprs per column") {
    val dir = tmpDir("prof")
    Seq((0L, "x", "en", Some("web"), 1L), (1L, "y", "en", None, 1L),
      (2L, "x", "de", Some("arxiv"), 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Analytics.q116Profile(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("doc_id") == ((3L, 0L, 3L, "0", "2")))
    assert(got("text") == ((3L, 0L, 2L, "x", "y")))
    assert(got("lang") == ((3L, 0L, 2L, "de", "en")))
    assert(got("source") == ((3L, 1L, 2L, "arxiv", "web")))
    assert(got("n_chars") == ((3L, 0L, 1L, "1", "1")))
  }

  test("bpe apply: ordered merges, second-order rule, adjacent repeats all merge") {
    val dir = docsDir("bpe", Seq((0L, "the inner"), (1L, "thth")))
    val got = Analytics.q118BpeApply(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // "the" -> t·h, then th·e (second-order); "inner" -> [in, n, er];
    // "thth" -> BOTH adjacent t·h pairs merge (double-space invariant),
    // th·th is not a rule -> [th, th]
    assert(got == Map("the" -> 1L, "in" -> 1L, "n" -> 1L, "er" -> 1L,
      "th" -> 2L))
  }

  test("bpe kernel ≡ composed lattice replace-chain on adversarial tokens") {
    graft.plans.TextExpressions.register(spark)
    val toks = Seq("the", "inner", "thth", "ththth", "tthh", "ererer",
      "anon", "thethe", "tininti", "a", "x", "rere", "onon", "thhe",
      "interminable", "anthropomorphization", "ttttt", "hhhh",
      "thinkingonandon") ++
      (0 until 200).map(i => new scala.util.Random(i).alphanumeric
        .filter(_.isLower).take(1 + i % 12).mkString)
    val df = toks.toDF("w")
    val got = df.select(col("w"),
        call_function("bpe_units", col("w")).as("k"),
        graft.queries.Analytics.bpeApplyComposed(col("w")).as("c"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"token '${r.getString(0)}'")
    }
  }

  test("kcore: peel rounds match a brute-force replay of the synthesized graph") {
    val n = 24L
    val dir = docsDir("kcore", (0L until n).map(i => (i, "x")))
    val got = Analytics.q119Kcore(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // brute-force: same synthesis, same peel
    val m = n
    var edges = (0L until n).flatMap(i =>
        Seq((i * 7 + 3) % m, (i * 13 + 5) % m, (i + 1) % m).map(d => (i, d)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val want = (1 to 4).map { r =>
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val alive = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => alive(e._1) && alive(e._2))
      (r, alive.size.toLong, edges.size.toLong)
    }
    assert(got.toSeq == want)
  }

  test("decay: right-shift half-life weights, exact integer sums") {
    val dir = tmpDir("decay")
    val ts = (d: String) => java.sql.Timestamp.valueOf(s"$d 12:00:00")
    Seq(
      (1L, ts("2024-01-31"), 1L, "buy", 10.00, "{}"),
      (2L, ts("2024-01-24"), 1L, "buy", 10.00, "{}"), // age 7 -> /2
      (3L, ts("2024-01-16"), 1L, "buy", 10.01, "{}"), // age 15 -> /4
      (4L, ts("2024-01-31"), 1L, "view", 2.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q120Decay(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // buy: 1000 + 1000/2 + 1001/4 = 1000+500+250; counts 1000+500+250
    assert(got("buy") == ((3L, 1750L, 1750L)))
    assert(got("view") == ((1L, 200L, 1000L)))
  }

  test("incremental CC ≡ full recompute; isolated docs stay singletons") {
    // 61 docs: the max id is NOT 8-aligned, so the tail block synthesizes
    // dst ids past the corpus end — the membership semi-join must drop
    // them (the sf0.01 phantom-node mismatch this round's debug found)
    val n = 61L
    val dir = docsDir("ccinc", (0L until n).map(i => (i, "x")))
    val got = Analytics.q121CcIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute-force full CC over the same synthesized block edges
    val edges = (0L until n).filter(_ % 3 != 0)
      .map(i => (i, (i - i % 8) + (i * 5 + 1) % 8))
      .filter { case (a, b) => a != b && b < n }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x
      else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0L until n).groupBy(find).map { case (r, m) =>
      (r, m.size.toLong) }.toSeq.sorted
    assert(got.toSeq == want)
    assert(got.length > 1, "graph must have multiple components")
    assert(got.exists(_._2 > 1), "and at least one non-trivial one")
  }

  test("price bands: deciles by first-row cumulative rank, exact integers") {
    val dir = tmpDir("bands")
    // 10 rows of $100..$1000 in one flag -> each $100 bin is its own decile
    val rows = (1 to 10).map(i => ("A", i * 100.0)) :+ (("B", 250.0))
    rows.toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Analytics.q122PriceBands(spark, dir).collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    (0 to 9).foreach { b =>
      assert(got(("A", b)) == ((1L, b + 1L, b + 1L)))
    }
    assert(got(("B", 0)) == ((1L, 2L, 2L)))
  }

  test("late data: running-max lateness per user, 600 s tolerance") {
    val dir = tmpDir("late")
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "buy", 1.0, "{}"),
      (2L, ts("2024-01-01 09:45:00"), 7L, "buy", 1.0, "{}"), // 900 s late
      (3L, ts("2024-01-01 09:55:00"), 7L, "view", 1.0, "{}"), // 300 s: in tolerance
      (4L, ts("2024-01-01 11:00:00"), 8L, "buy", 1.0, "{}")) // other user, fine
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.q123LateData(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("buy") == ((3L, 1L, 900L)))
    assert(got("view") == ((1L, 0L, 0L)))
  }

  test("percentile state merge ≡ rescan on a split fact") {
    val dir = tmpDir("pctl")
    val rows = Seq(
      ("A", 1.0, "1995-03-01"), ("A", 2.0, "1995-06-01"),
      ("A", 3.0, "1996-02-01"), ("A", 4.0, "1996-03-01"),
      ("A", 5.0, "1997-01-01"),
      ("B", 10.0, "1995-01-01"), ("B", 20.0, "1997-01-01"))
    rows.toDF("l_returnflag", "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Analytics.q117PctlStateMerge(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("A") == ((5L, 2.0, 3.0, 4.0, 4.8)))
    assert(got("B") == ((2L, 12.5, 15.0, 17.5, 19.5)))
  }
}
