package graft

import graft.operators.PageRank

/** Integer PageRank semantics on graphs small enough to fold by hand. */
class PageRankSpec extends SparkSpec {
  import sqlImplicits._

  test("two-node cycle holds the uniform fixed point exactly") {
    // 0 ↔ 1: contrib = r/1, so r' = 150000 + 85·1000000/100 = 1000000
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val got = PageRank.iterate(edges, nodes, iters = 3,
        dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1000000L, 1L -> 1000000L))
  }

  test("star graph: sink accumulates, sources decay, mass conserved-ish") {
    // 1,2,3 → 0; 0 → 1. After i1: r(0) = 150000 + 85% of 3·1000000 =
    // 2700000; r(1) = 150000 + 850000 = 1000000; r(2) = r(3) = 150000.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val it1 = PageRank.iterate(edges, nodes, 1, 85, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(it1 == Map(0L -> 2700000L, 1L -> 1000000L,
      2L -> 150000L, 3L -> 150000L))
    // i2: r(0) = 150000 + 85·(1000000 + 2·150000)/100 = 1255000
    //     r(1) = 150000 + 85·2700000/100 = 2445000
    val it2 = PageRank.iterate(edges, nodes, 2, 85, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(it2(0L) == 1255000L && it2(1L) == 2445000L)
    assert(it2(2L) == 150000L && it2(3L) == 150000L)
  }

  test("out-degree split floors deterministically; no-inlink floor holds") {
    // 0 → {1, 2, 3}: each gets ⌊1000000/3⌋ = 333333
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = PageRank.iterate(edges, nodes, 1, 85, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 150000 + 85·333333 div 100 = 150000 + 283333 = 433333
    assert(got(1L) == 433333L && got(2L) == 433333L && got(3L) == 433333L)
    assert(got(0L) == 150000L) // no in-links → damped floor only
  }

  test("personalized: mass flows only from seeds; all-seeds ≡ uniform") {
    // path 0 → 1 → 2 plus isolated-from-seed node 3 → 0; seed = {0}.
    // i1: r(0) = 150000 + 85·⌊r(3)/1⌋/100 = 150000 (r0(3) = 0);
    //     r(1) = 0 + 85·1000000/100 = 850000; r(2) = 0; r(3) = 0.
    // i2: r(1) = 85·150000/100 = 127500; r(2) = 85·850000/100 = 722500.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 0L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val it2 = PageRank.personalized(edges, nodes, seeds, iters = 2,
        dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(it2 == Map(0L -> 150000L, 1L -> 127500L,
      2L -> 722500L, 3L -> 0L))

    // personalization over the FULL node set degenerates to iterate
    val all = PageRank.personalized(edges, nodes, nodes, 3, 85, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uni = PageRank.iterate(edges, nodes, 3, 85, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == uni)

    // the operator is public: a DUPLICATED seed id must not fan out the
    // node set (duplicate rank rows double-counting contributions)
    val dupSeeds = Seq(0L, 0L, 0L).toDF("id")
    val dup = PageRank.personalized(edges, nodes, dupSeeds, 2, 85, 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == it2, s"duplicate seeds changed the ranks: $dup")
  }
}
