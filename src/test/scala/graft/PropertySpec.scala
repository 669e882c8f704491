package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Schemas
import graft.sources.TableStore

/** Property tests from SURVEY §5.2: running total ≡ scanLeft, upsert
  * idempotency + last-writer-wins, diff∘upsert convergence, date-sequence
  * length/bounds. ScalaCheck generators sampled with fixed seeds (no
  * scalatest-plus bridge in the offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import sqlImplicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("W2 running total ≡ scanLeft over the ordered values") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gen = Gen.nonEmptyListOf(
      Gen.chooseNum(-5000.0, 5000.0).map(v => math.round(v * 100) / 100.0))
    samples(gen, 8).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("seq", "v")
      val w = Window.orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df.select(sum($"v").over(w)).collect().map(_.getDouble(0))
      val want = vs.scanLeft(0.0)(_ + _).tail
      got.zip(want).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
    }
  }

  test("connectedComponents ≡ union-find on random graphs") {
    // The most intricate operator (alternating star rounds + probabilistic
    // convergence) against ground truth: random edge lists, clusters must
    // equal a driver-side union-find's min-representative labeling.
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 29L)))
    samples(edgeGen, 5).foreach { edges =>
      val df = edges.toDF("id1", "id2")
      // threshold 0 forces the distributed star loop; the default takes
      // the driver union-find fast path — BOTH must match ground truth
      val got = graft.operators.Dedup
        .connectedComponents(df, smallGraphThreshold = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val gotFast = graft.operators.Dedup.connectedComponents(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gotFast == got, "fast path diverges from the star loop")

      // union-find truth (min id as representative)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.filter(e => e._1 != e._2)
      nodes.foreach { case (a, b) => union(a, b) }
      val want = nodes.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
      assert(got == want,
        s"CC mismatch on ${edges.take(10)}...: got $got want $want")
    }
  }

  test("TopKAggregator: merge laws partial aggregation depends on") {
    // Spark may split the input into arbitrary partial buffers and merge
    // them in any grouping/order; correctness therefore REQUIRES that
    // reduce-then-merge over any partitioning equals a global sort-take,
    // and that merge is commutative and associative on pruned buffers.
    val agg = new graft.functions.TopKAggregator(5)
    val scoredGen = Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0, 9))
      .map { case (id, s) => graft.functions.Scored(id, s / 3.0) } // forced ties
    val gen = Gen.zip(Gen.listOfN(40, scoredGen), Gen.chooseNum(1, 39))
    samples(gen, 20).foreach { case (xs, cut) =>
      val want = xs.sortBy(s => (-s.score, s.id)).take(5)
      // arbitrary two-way split, reduced independently, merged both ways
      val (a, b) = xs.splitAt(cut)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufA, bufB)) == want)
      assert(agg.merge(bufA, bufB) == agg.merge(bufB, bufA)) // commutative
      // associativity across a three-way split
      val (c, d) = b.splitAt(b.length / 2)
      val bufC = c.foldLeft(agg.zero)(agg.reduce)
      val bufD = d.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(agg.merge(bufA, bufC), bufD) ==
        agg.merge(bufA, agg.merge(bufC, bufD)))
      assert(agg.merge(bufA, agg.zero) == bufA) // identity on pruned buffers
    }
  }

  test("M1 upsert: idempotent, last writer wins per key") {
    val gen = Gen.zip(Gen.listOfN(8, Gen.chooseNum(1, 5)),
      Gen.listOfN(8, Gen.chooseNum(1, 5)))
    samples(gen, 4).foreach { case (k1, k2) =>
      val s = new TableStore(spark, tmpDir("prop"))
      def batch(ks: Seq[Int], tag: String) = spark.createDataFrame(
        java.util.Arrays.asList(ks.distinct.map(k =>
          Row(Fixtures.user, Date.valueOf(f"2021-01-${k}%02d"), s"$tag-$k")): _*),
        Schemas.rawDayData)
      s.upsert("RawDayData", batch(k1, "a"))
      s.upsert("RawDayData", batch(k2, "b"))
      val once = s.read("RawDayData").collect()
        .map(r => (r.getDate(1).toString, r.getString(2))).sorted.toSeq
      s.upsert("RawDayData", batch(k2, "b")) // idempotent
      val twice = s.read("RawDayData").collect()
        .map(r => (r.getDate(1).toString, r.getString(2))).sorted.toSeq
      assert(once == twice)
      twice.foreach { case (d, tag) =>
        val k = d.split("-")(2).toInt
        if (k2.contains(k)) assert(tag == s"b-$k") else assert(tag == s"a-$k")
      }
    }
  }

  test("D2 ∘ M1: after an upsert, re-diffing the same batch is empty (convergence)") {
    import graft.operators.Extractors
    val gen = Gen.listOfN(5, Gen.chooseNum(0.0, 3000.0))
    samples(gen, 3).foreach { ws =>
      val days = ws.zipWithIndex.map { case (w, i) =>
        Fixtures.fakeDays.head.copy(
          date = Date.valueOf(f"2021-02-${i + 1}%02d"), water = w)
      }
      val s = new TableStore(spark, tmpDir("conv"))
      s.initTable("RawDayData")
      val ser = Extractors.serializeDays(spark.createDataset(days).toDF())
      val d1 = Extractors.changedDays(ser, s.read("RawDayData"))
      assert(d1.count() == days.length)
      s.upsert("RawDayData", d1)
      assert(Extractors.changedDays(ser, s.read("RawDayData")).count() == 0)
    }
  }

  test("D13 date sequence: length = Δdays + 1, endpoints inclusive, ordered") {
    val gen = Gen.zip(Gen.chooseNum(0, 2000), Gen.chooseNum(0, 400))
    samples(gen, 6).foreach { case (s0, n) =>
      val from = java.time.LocalDate.of(2015, 1, 1).plusDays(s0.toLong)
      val to = from.plusDays(n.toLong)
      val got = graft.sources.Dates.dateRange(spark, from, to)
        .collect().map(_.getDate(0).toLocalDate)
      assert(got.length == n + 1)
      assert(got.head == from && got.last == to)
      assert(got.sliding(2).forall(p => p.length < 2 || p(0).plusDays(1) == p(1)))
    }
  }
}
