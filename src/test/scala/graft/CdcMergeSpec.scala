package graft

import graft.operators.CdcMerge

/** Last-writer-wins semantics of the CDC apply on crafted feeds. */
class CdcMergeSpec extends SparkSpec {
  import sqlImplicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("k", "status", "price")

  private def feed(rows: (Long, String, Long, Long, String)*) =
    rows.toDF("k", "status", "price", "seq", "op")

  private def result(base: org.apache.spark.sql.DataFrame,
                     f: org.apache.spark.sql.DataFrame) =
    CdcMerge.merge(base, f, "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("update wins, delete erases, late insert revives") {
    val base = snap((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L))
    val f = feed(
      (1L, "A", 11L, 1L, "U"),            // plain update
      (2L, "A", 0L, 1L, "D"),             // delete
      (3L, "A", 0L, 1L, "D"), (3L, "B", 99L, 2L, "I"), // delete then revive
      (4L, "C", 40L, 1L, "I"))            // brand-new key
    val got = result(base, f)
    assert(got == Map(
      1L -> ("A", 11L), 3L -> ("B", 99L), 4L -> ("C", 40L)))
  }

  test("hot key: highest seq wins regardless of feed order") {
    val base = snap((1L, "A", 1L))
    val churn = (1L to 50L).map(s =>
      (1L, "A", s * 100L, s, if (s % 2 == 0) "U" else "I"))
    val got = result(base, feed(churn.reverse: _*))
    assert(got == Map(1L -> ("A", 5000L)))
  }

  test("equal-seq collision breaks deterministically U > I > D") {
    val base = snap((1L, "A", 1L), (2L, "A", 2L))
    val f = feed(
      (1L, "A", 7L, 1L, "U"), (1L, "A", 0L, 1L, "D"),  // U beats D
      (2L, "A", 0L, 1L, "D"), (2L, "B", 8L, 1L, "I"))  // I beats D
    val got = result(base, f)
    assert(got == Map(1L -> ("A", 7L), 2L -> ("B", 8L)))
  }

  test("base row survives untouched keys; feed must carry payload") {
    val base = snap((9L, "Z", 90L))
    assert(result(base, feed()) == Map(9L -> ("Z", 90L)))
    intercept[IllegalArgumentException] {
      CdcMerge.merge(base, Seq((9L, 1L, "U")).toDF("k", "seq", "op"),
        "k", "seq", "op")
    }
  }
}
