package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, each designed to
  * scale: driver-side collection only behind an explicit bounded threshold
  * (the CC small-graph fast path), no unbounded cross join — candidate
  * generation always goes through a hash-partitioned equi-join (exact key,
  * LSH band, simhash band, or shingle), so the shuffle key is the thing
  * being matched and skew stays bounded by band width.
  */
object Dedup {

  /** Exact dedup: one canonical representative (min id) per duplicate group.
    * A single hash aggregate — partial (map-side) combine keeps the shuffle
    * proportional to the number of distinct keys, not rows. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))

  /** Exact dedup keyed on a dual fingerprint (md5 ⊕ xxhash64 of `keyCol`)
    * instead of the raw key bytes. Same output contract as [[exact]] minus
    * the key column: (idCol = min id per group, copies, carried columns).
    * The scale rationale: `exact`'s groupBy ships the KEY through the
    * exchange — for near-unique document text the shuffle payload is the
    * corpus itself; this variant ships 24 bytes per row (md5 grouped as
    * its 16 RAW bytes via unhex — Spark's md5() returns the 32-char hex
    * string, which would nearly double the key and compare as a string).
    * PROBABILISTIC in
    * the same sense as the CC convergence fingerprint: merging two
    * distinct keys needs an md5 AND an xxhash64 collision on the same
    * pair (< 2^-190 across 10^12 docs) — acceptable where the key column
    * is large; use [[exact]] when byte-exactness is contractual.
    *
    * `carry` columns must be functions of the key (identical within a
    * group — e.g. a token count derived from the text); they are carried
    * with `min`, which is exact under that contract. */
  def exactByFingerprint(df: DataFrame, keyCol: String, idCol: String,
                         carry: Seq[String] = Nil): DataFrame = {
    val aggs = min(col(idCol)).as(idCol) +: count(lit(1)).as("copies") +:
      carry.map(c => min(col(c)).as(c))
    df.groupBy(unhex(md5(col(keyCol))), xxhash64(col(keyCol)))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol) +: col("copies") +: carry.map(col): _*)
  }

  /** All-pairs n-gram Jaccard via a shingle-inverted-index join: explode
    * distinct shingles, self-join on the shingle (hash-partitioned — never a
    * cross join), count intersections, derive |A∪B| from per-doc sizes.
    * Quadratic only within a shingle's posting list; callers bound the
    * candidate universe with `pred` (or dedup/minhash first at scale). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        pred: Column = lit(true)): DataFrame = {
    val sh = df.where(pred)
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x")
      .join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    // ratio compared raw (identical IEEE division both engines) and emitted
    // as truncated ppm — decimal rounding of rationals can land on exact
    // half-boundaries where engines' rounding algorithms disagree.
    val j = col("inter").cast("double") /
      (col("sx") + col("sy") - col("inter"))
    inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("sx")), "id1")
      .join(sizes.select(col("id").as("id2"), col("sz").as("sy")), "id2")
      .where(j >= threshold)
      .select(col("id1"), col("id2"), (j * 1e6).cast("int").as("jaccard_ppm"))
  }

  /** Shingle-set CONTAINMENT (Broder's asymmetric resemblance,
    * |A ∩ B| / |A|) — what catches a short document swallowed whole by a
    * longer one, where symmetric Jaccard stays low because the union is
    * dominated by the long side. Emits ORDERED pairs: (id1, id2) means
    * id1's shingles are ≥ threshold contained in id2. Same inverted-index
    * shape as [[ngramJaccardPairs]] (equi-join on the shingle, quadratic
    * only within a posting list, ratio compared raw and emitted as
    * truncated ppm); the only differences are the `=!=` pair condition
    * (both directions are meaningful) and the divisor (|A| alone). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double,
                       pred: Column = lit(true)): DataFrame = {
    val sh = df.where(pred)
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x")
      .join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") =!= col("y.id"))
      .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    val c = col("inter").cast("double") / col("s1")
    inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("s1")), "id1")
      .where(c >= threshold)
      .select(col("id1"), col("id2"), col("inter"),
        (c * 1e6).cast("int").as("containment_ppm"))
  }

  /** Blocked fuzzy record linkage: candidate pairs share a cheap blocking
    * key (the classic entity-resolution move — sort-neighborhood /
    * standard blocking), then an exact Levenshtein verify keeps pairs
    * within `maxDist` edits. The quadratic bill is Σ(block²), never N² —
    * the block key is the only corpus shuffle, and at 100 TB the lever is
    * the key's selectivity (append a length band or phonetic code to
    * split hot blocks; a pathological block is one AQE-skew-split task).
    * Levenshtein runs classic insert/delete/substitute in both engines,
    * so the surviving pair set hash-matches the SQL twin verbatim. */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, blockCol: Column,
                        nameCol: Column, maxDist: Int,
                        pred: Column = lit(true)): DataFrame = {
    val side = df.where(pred)
      .select(col(idCol).as("id"), blockCol.as("blk"), nameCol.as("nm"))
    side.as("x")
      .join(side.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        levenshtein(col("x.nm"), col("y.nm")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** MinHash + banded LSH candidate generation, then exact Jaccard
    * verification of candidates only. The scale path for near-dup detection:
    * candidate cost is Σ(bucket²) per band instead of n², and verification
    * touches only surviving pairs. Signature banding: `numPerms` hashes
    * split into `bands` bands of `numPerms/bands` rows. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 3, numPerms: Int = 64,
                      bands: Int = 16, threshold: Double = 0.8,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val r = numPerms / bands
    val docs = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
    // The generator must consume the signature exactly ONCE: referencing the
    // signature column from multiple band expressions lets CollapseProject
    // inline the expensive minhash tree into every slot (measured 16×
    // recompute → 95 s instead of ~3 s at 5k docs). posexplode the signature
    // itself, then combine each band's hashes with an order-independent,
    // perm-salted bit_xor under partial aggregation — the shuffle carries
    // one row per (doc, band).
    graft.plans.TextExpressions.register(df.sparkSession)
    val sigRows = docs.where(size(col("sh")) > 0)
      .select(col("id"),
        posexplode(call_function("minhash_signature", col("sh"), lit(numPerms)))
          .as(Seq("perm", "h")))
    val banded = cappedBuckets(sigRows
      .groupBy(col("id"), (col("perm") / r).cast("int").as("band"))
      .agg(bit_xor(xxhash64(col("h"), col("perm"))).as("bh")),
      Seq("band", "bh"), maxBucket)
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
    // Exact verification: shingle-set Jaccard per candidate pair. The
    // shingle arrays are derived AFTER the candidate join, so the kernel
    // runs over ~2×|candidates| matched rows — joining the pre-shingled
    // `docs` frame instead would evaluate the corpus-wide Shingles
    // projection once per side (the kernel is fast, but 2 extra full-corpus
    // passes is real CPU at scale). Bonus: with a small candidate set AQE
    // broadcasts it, so the corpus text streams through both joins with no
    // shuffle at all.
    //
    // KNOWN TRADE-OFF, measured: shingling the DISTINCT candidate members
    // instead (semi-join, then join pairs to the pre-shingled members)
    // bounds kernel evals by min(2×|pairs|, |corpus|) per side — better
    // when a near-identical m-doc cluster survives banding and yields ~m²
    // pairs — but the members' distinct + double member-join overhead
    // measured 1.5× SLOWER end-to-end at sf0.1's sparse candidate density
    // (interleaved 3-round A/B: per-pair 0.90–1.12 s, member-distinct
    // 1.39–2.11 s). Per-pair wins for the common case; the pathological
    // dense case is what `maxBucket` posting caps exist to bound — set a
    // cap when the corpus may contain large near-identical clusters.
    val textDocs = df.select(col(idCol).as("id"), col(textCol).as("_txt"))
    val withSets = candidates
      .join(textDocs.select(col("id").as("id1"), col("_txt").as("_t1")), "id1")
      .join(textDocs.select(col("id").as("id2"), col("_txt").as("_t2")), "id2")
      .select(col("id1"), col("id2"),
        shingles(col("_t1"), shingleSize).as("sh1"),
        shingles(col("_t2"), shingleSize).as("sh2"))
    val j = size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
      size(array_union(col("sh1"), col("sh2")))
    withSets
      .where(j >= threshold)
      .select(col("id1"), col("id2"), (j * 1e6).cast("int").as("jaccard_ppm"))
  }

  /** Duplicate-cluster formation from near-dup pairs: connected components
    * by alternating large-star / small-star edge rewriting (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). Converges in
    * O(log n) rounds regardless of component diameter — min-label
    * propagation is O(diameter), and chained near-dups are exactly the
    * long-diameter case. Below `smallGraphThreshold` pairs the whole loop
    * is replaced by a driver-side union-find (an adaptive decision in the
    * AQE-broadcast spirit — near-dup graphs are routinely tiny relative to
    * their corpus, and each star round costs ~2 shuffle jobs); the
    * distributed loop's scale discipline per round:
    *   - ONE action: the new edge set is materialized eagerly (truncating
    *     lineage so it cannot grow with the iteration count), and the
    *     convergence fingerprint rides on that same job via `observe()` —
    *     no separate join-and-count action.
    *   - The PREVIOUS round's materialized edge set is unpersisted as soon
    *     as the new one exists — a 30-round run holds two edge copies, not
    *     thirty (executor storage would otherwise accumulate until driver
    *     GC happened to trigger the ContextCleaner).
    *   - Star operations are groupBy-min + join-back (never collect_set), so
    *     a high-degree node costs a shuffle of its edges, not an array.
    *   - Convergence detection is PROBABILISTIC: two independent 64-bit
    *     xor-of-hash fingerprints plus the edge count must all repeat. A
    *     double collision on a changing edge set (~2^-128) could in
    *     principle stop a round early; the result would still be a valid
    *     coarser clustering of true clusters, never a wrong merge.
    *
    * `checkpointDir`: by default rounds materialize via `localCheckpoint`
    * (executor-local storage — fast, but an executor loss mid-loop is
    * unrecoverable because lineage is truncated). Pass a reliable directory
    * (HDFS/S3 at cluster scale) to write every `reliableInterval`-th round
    * through `Dataset.checkpoint` instead. AUTOMATIC storage-loss survival
    * (Spark recomputing lost partitions from the checkpoint files) holds
    * only at `reliableInterval = 1`, where every round is file-backed —
    * the configuration the eviction-injection spec runs. A larger interval
    * trades that for fewer writes: intermediate rounds are local-only, so
    * a loss there still fails the job, but the latest reliable round's
    * files are RETAINED until the next reliable round lands (a local round
    * never deletes its durable anchor), so a driver/orchestrator can
    * restart the loop from those files instead of from the pair source.
    *
    * Returns (id, cluster) with cluster = min member id, materialized — the
    * loop's working sets are freed before returning. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 30,
                          checkpointDir: Option[String] = None,
                          reliableInterval: Int = 5,
                          smallGraphThreshold: Long = 100000L): DataFrame =
    connectedComponentsWithHook(pairs, maxIters, checkpointDir,
      reliableInterval, smallGraphThreshold, _ => ())

  /** [[connectedComponents]] with a between-rounds seam: `onRoundEnd(iter)`
    * fires after each round's action and convergence bookkeeping. Test-only
    * — the eviction-injection spec uses it to drop every executor-local
    * block between rounds and prove reliable mode converges anyway. */
  private[graft] def connectedComponentsWithHook(
      pairs: DataFrame, maxIters: Int, checkpointDir: Option[String],
      reliableInterval: Int, smallGraphThreshold: Long,
      onRoundEnd: Int => Unit): DataFrame =
    IterativeCheckpointer.withCheckpointDir(pairs.sparkSession, checkpointDir) {
      ccLoop(pairs, maxIters, checkpointDir, reliableInterval,
        smallGraphThreshold, onRoundEnd)
    }

  private def ccLoop(
      pairs: DataFrame, maxIters: Int, checkpointDir: Option[String],
      reliableInterval: Int, smallGraphThreshold: Long,
      onRoundEnd: Int => Unit): DataFrame = {
    val spark = pairs.sparkSession

    // Shared round-frame machinery (see IterativeCheckpointer's scaladoc
    // for the local-first / observe-once / reclaim-reliable-files
    // reasoning; the eviction-injection spec in DedupSimilaritySpec pins
    // the durability contract). The CollectMetrics subtlety is why
    // materialize localCheckpoints BEFORE the reliable write: a direct
    // Dataset.checkpoint(eager) on the observed plan would run it twice,
    // XORing every edge hash twice and collapsing convergence detection
    // to edge-count equality.
    val ck = new IterativeCheckpointer(spark, checkpointDir, reliableInterval)
    import ck.{free, materialize, promote, stage, isReliableRound}

    // Materialize the (expensive — usually an LSH pipeline) pair source
    // once and cut its lineage; the loop re-reads it only to seed
    // nodes/edges. LOCAL first: the small-graph decision below must happen
    // before any reliable promotion, or a small reliable-mode graph would
    // pay a distributed checkpoint write just to delete it again.
    val pLocal = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .where(col("a") =!= col("b"))
      .localCheckpoint(eager = true)

    // ADAPTIVE small-graph path — same spirit as AQE's broadcast decision:
    // the star rounds cost ~2 shuffle jobs each, and a near-dup pair graph
    // is routinely tiny relative to its corpus (pairs ≪ docs), so under
    // the threshold (strictly: `< threshold`, so 0 disables the path even
    // for empty inputs) a driver-side union-find replaces the whole loop.
    // The count is a cheap job over the just-persisted blocks; 100k pairs
    // collect as ~1.6 MB. Semantics identical to the fixed point (every
    // endpoint → min id of its component — the CC property spec runs both
    // paths against the same ground truth); the distributed loop runs
    // unchanged above the threshold, where 100 TB graphs live.
    val idsAreLong = pLocal.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (idsAreLong && pLocal.count() < smallGraphThreshold) {
      val edges = pLocal.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // union-by-min + all-singleton start ⇒ each component's root IS its
      // min id, so find(id) is already the cluster label
      val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val rows = ids.map(id => (id, find(id)))
      free(pLocal)
      import pairs.sparkSession.implicits._
      return rows.toSeq.toDF("id", "cluster")
    }
    val p = promote(pLocal)

    val nodes = stage(p.select(col("a").as("id"))
      .unionAll(p.select(col("b").as("id")))
      .distinct())

    // large-star: each node u connects its strictly-larger neighbors to
    // m = min(Γ(u) ∪ {u}). Emitted edges are (v, m) with v > m.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a").as("u"), least(col("a"), col("mn")).as("m"))
      sym.as("s").join(mins.as("t"), col("s.a") === col("t.u"))
        .where(col("s.b") > col("s.a"))
        .select(col("s.b").as("a"), col("t.m").as("b"))
        .distinct()
    }
    // small-star: orient edges (u = max, v = min); each u connects its
    // smaller neighborhood (and itself) to m = min neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      val mins = o.groupBy(col("u")).agg(min(col("v")).as("m"))
      o.as("s").join(mins.as("t"), col("s.u") === col("t.u"))
        .where(col("s.v") =!= col("t.m"))
        .select(col("s.v").as("a"), col("t.m").as("b"))
        .unionAll(mins.select(col("u").as("a"), col("m").as("b")))
        .distinct()
    }

    var e = stage(p.select(greatest(col("a"), col("b")).as("a"),
      least(col("a"), col("b")).as("b")).distinct())
    var lastFp: Option[(Long, Long, Long)] = None
    var converged = false
    var iter = 0
    // The last reliable round's frame, kept alive while local-only rounds
    // supersede it: freeing it as soon as the next LOCAL round materializes
    // would delete the only durable copy in the system — the exact state
    // reliable mode exists to preserve — making every interval > 1
    // equivalent to local-only mode. Reclaimed when the next reliable
    // round lands (or at exit).
    var reliableAnchor: Option[DataFrame] = None
    while (!converged && iter < maxIters) {
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      val prev = e
      // prev is file-backed if it is the promoted seed or a reliable round
      val prevReliable =
        checkpointDir.isDefined && (iter == 0 || isReliableRound(iter - 1))
      // the one action per round; fingerprints ride along via observe()
      e = materialize(smallStar(largeStar(e))
        .observe(obs, count(lit(1)).as("cnt"),
          coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("fp"),
          coalesce(bit_xor(xxhash64(lit(0x9E3779B9L), col("b"), col("a"))),
            lit(0L)).as("fp2")), iter)
      // reclaim the superseded copy — unless it is the durable anchor and
      // its successor is local-only
      if (isReliableRound(iter)) {
        free(prev); reliableAnchor.foreach(free); reliableAnchor = None
      } else if (prevReliable) {
        reliableAnchor.foreach(free); reliableAnchor = Some(prev)
      } else free(prev)
      val m = obs.get
      val fp = (m("cnt").asInstanceOf[Long], m("fp").asInstanceOf[Long],
        m("fp2").asInstanceOf[Long])
      converged = lastFp.contains(fp)
      lastFp = Some(fp)
      onRoundEnd(iter)
      iter += 1
    }
    // At the fixed point the edge set is a star forest (child → min root).
    // groupBy-min instead of a bare join keeps the result well-formed even
    // if maxIters was hit before convergence.
    val parent = e.groupBy(col("a")).agg(min(col("b")).as("cluster"))
    val result = stage(nodes.as("n")
      .join(parent.as("pr"), col("n.id") === col("pr.a"), "left_outer")
      .select(col("n.id").as("id"),
        coalesce(col("pr.cluster"), col("n.id")).as("cluster")))
    Seq(e, nodes, p).foreach(free) // result is self-contained now
    reliableAnchor.foreach(free)
    result
  }

  /** 64-bit SimHash per document as a single codegen'd scalar projection
    * ([[graft.plans.TextExpressions.SimHash64]]): the per-bit majority
    * votes accumulate in one pass over the token array — NO explode, NO
    * aggregate, NO shuffle. Bit-identical to the explode→64-vote-sums
    * composition it replaced (pinned in TextExpressionsSpec; null-text
    * docs are dropped, matching the explode's behavior).
    *
    * Contract: one row per document with unique `idCol` — as a projection
    * this emits one hash per input ROW, where the old groupBy incidentally
    * merged votes across duplicate-id rows (an accidental semantic no
    * caller relied on; callers that accept untrusted batches guard ids
    * explicitly, e.g. streaming.DocStream).
    *
    * `portable = true` derives the per-token hash from md5 instead of
    * xxhash64 ([[graft.plans.PortableHashKernel]]) so an external engine
    * can recompute the simhash — the mode the DuckDB-oracle catalog query
    * runs in. Default stays xxhash64 (faster per token; no MD5). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              portable: Boolean = false): DataFrame = {
    graft.plans.TextExpressions.register(df.sparkSession)
    val fn = if (portable) "simhash64_portable" else "simhash64"
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        call_function(fn, tokens(col(textCol))).as("simhash"))
  }

  /** Drop rows whose (bucket-key) group exceeds `maxBucket` members — the
    * posting-list cap from IR. Mega-buckets (templated/short docs hashing
    * identically in a band) make the band self-join Σ(bucket²)-quadratic; the
    * cap bounds any bucket's cost at maxBucket². Contract: a pair inside an
    * over-cap bucket is found only via its OTHER bands — exact duplicates
    * (which over-cap every band) should be removed by [[exact]] first.
    * No-op (and no extra aggregation in the plan) at the default. */
  private[graft] def cappedBuckets(banded: DataFrame, keys: Seq[String],
                                   maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) banded
    else {
      val sizes = banded.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("bsz"))
        .where(col("bsz") <= maxBucket)
        .drop("bsz")
      banded.join(sizes, keys) // hash join on the same key as the band join
    }

  /** SimHash near-dup pairs: band the 64-bit hash into `maxHamming + 1`
    * near-equal chunks (pigeonhole: a pair within Hamming distance h differs
    * in at most h bands, so at least one of h+1 chunks matches exactly),
    * equi-join on the chunk, verify with bit_count(xor). The band count is
    * DERIVED from maxHamming, so the recall-1 guarantee holds for any
    * distance — a fixed 4-band split only guaranteed h <= 3. */
  /** The pigeonhole band layout over a 64-bit `simhash` column for a given
    * Hamming budget: maxHamming + 1 near-equal chunks. SHARED between the
    * batch pair operator and the streaming admission index
    * ([[graft.streaming.DocStream]]) — the index persists this layout
    * across batches, so a divergent copy would silently void the recall
    * guarantee against previously-indexed rows. */
  private[graft] def simhashBandStructs(maxHamming: Int): Seq[Column] = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming $maxHamming outside [0, 63]")
    val nBands = maxHamming + 1
    val bounds = (0 to nBands).map(i => i * 64 / nBands)
    (0 until nBands).map { i =>
      val lo = bounds(i)
      val w = bounds(i + 1) - lo
      val mask = if (w == 64) -1L else (1L << w) - 1
      struct(lit(i).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bv"))
    }
  }

  /** (id, simhash, band, bv) rows for a doc frame — simhash plus exploded
    * pigeonhole bands, posting-list capped. */
  private[graft] def simhashBanded(df: DataFrame, idCol: String,
                                   textCol: String, maxHamming: Int,
                                   maxBucket: Int,
                                   portable: Boolean = false): DataFrame =
    cappedBuckets(
      // materialized ONCE (r17): the banded relation is consumed by the
      // bucket-size census and by BOTH sides of the pair self-join, so
      // an un-checkpointed plan re-runs the full text→simhash kernel up
      // to four times. The checkpoint rows are (id, simhash) — 16 bytes
      // per doc regardless of text size; the band explode downstream is
      // recomputed per consumer from those 16-byte rows, which is noise.
      simhash(df, idCol, textCol, portable).localCheckpoint(true)
        .select(col("id"), col("simhash"),
          explode(array(simhashBandStructs(maxHamming): _*)).as("e"))
        .select(col("id"), col("simhash"),
          col("e.band").as("band"), col("e.bv").as("bv")),
      Seq("band", "bv"), maxBucket)

  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = Int.MaxValue,
                          portable: Boolean = false): DataFrame =
    bandedPairs(
      simhashBanded(df, idCol, textCol, maxHamming, maxBucket, portable),
      maxHamming)

  /** Banded Hamming near-dup pairs over an ARBITRARY pre-hashed frame
    * `hashed(id, simhash)` — the simhash pair machinery with the 64-bit
    * hash supplied by the caller (q141 feeds [[Multimodal.dhash63]]'s
    * perceptual image hash; any signature with the
    * small-Hamming ⇒ near-duplicate property plugs in). Identical
    * pigeonhole banding, bucket capping and xor verify as the text
    * path — ONE join implementation ([[bandedPairs]]). */
  def hammingNearDupPairs(hashed: DataFrame, maxHamming: Int = 3,
                          maxBucket: Int = Int.MaxValue): DataFrame =
    bandedPairs(
      cappedBuckets(
        // the simhashBanded materialize-once discipline for the caller-
        // supplied hash: q141's dhash63 kernel (hex + 63-way explode
        // over multi-KB payloads) ran once per consumer — four times —
        // before this checkpoint; the rows are 16 bytes per doc
        hashed.select(col("id"), col("simhash")).localCheckpoint(true)
          .select(col("id"), col("simhash"),
            explode(array(simhashBandStructs(maxHamming): _*)).as("e"))
          .select(col("id"), col("simhash"),
            col("e.band").as("band"), col("e.bv").as("bv")),
        Seq("band", "bv"), maxBucket),
      maxHamming)

  /** Band-collision self-join + exact xor verify shared by the text and
    * generic Hamming pair operators. */
  private def bandedPairs(banded: DataFrame, maxHamming: Int): DataFrame =
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)

  /** Cross-document repeated-span coverage — the EXACT-SUBSTRING dedup
    * signal (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): for each doc, how much of it is covered by an
    * n-token window that appears VERBATIM in some OTHER document. The
    * doc-level and near-dup passes can't see this regime (a boilerplate
    * paragraph pasted into thousands of otherwise-distinct pages); span
    * coverage is the per-doc filter signal a curation pass thresholds on.
    *
    * Pipeline, all keyed joins/aggs:
    *   - per doc, explode the window-start grid and hash each window in
    *     CODEGEN (slice + concat + md5 per exploded row). The
    *     build-windows-in-one-row transform-lambda alternative (the q85
    *     chunk recipe) avoids carrying the token array through the
    *     explode but pays ~T interpreted md5 lambda evaluations per doc —
    *     the dhash63 lesson again; one-JVM A/B at 100×: transform
    *     17.4–18.3 s vs explode 9.6–17.3 s, explode ≤ in every round.
    *     The emitted key is md5Head60(gram text), 8 B through every
    *     exchange instead of the gram string (the production shape at
    *     corpus scale; the oracle replays the same hash so the gate
    *     stays exact);
    *   - a gram is CROSS-DOC iff its occurrences span ≥ 2 distinct docs —
    *     min(id) ≠ max(id) per key, two cheap partial aggs instead of a
    *     count_distinct;
    *   - per-doc covered-token count = the union length of the shared
    *     windows' [pos, pos+n) intervals: sort shared starts per doc and
    *     sum least(n, pos − lag(pos)) — the q124 sweep, partitioned by
    *     doc (never an unpartitioned window).
    *
    * Returns (id, n_tokens, n_shared_starts, covered_tokens,
    * coverage_ppm) for EVERY doc (zero rows for docs shorter than n or
    * with no shared window). */
  def crossDocSpanCoverage(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame = {
    require(n >= 1, s"window length must be >= 1, got $n")
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("a"))
      .select(col("id"), col("a"), size(col("a")).as("n_tokens"))
    // materialized ONCE (r17): occ is consumed by the cross-doc census
    // AND the semi-join probe side — un-checkpointed, the executed plan
    // held two full tokenize→explode→window-md5 pipelines (the build's
    // dominant pass, every token window hashed twice). The checkpoint
    // rows are (id, pos, gk) — 24 bytes per window regardless of text
    // size — so materializing beats re-hashing at any corpus size.
    val occ = toks.where(col("n_tokens") >= n)
      .select(col("id"), col("a"),
        explode(sequence(lit(0), col("n_tokens") - n)).as("pos"))
      .select(col("id"), col("pos"),
        graft.functions.PortableHash.md5Head60(
          concat_ws(" ", slice(col("a"), col("pos") + lit(1), lit(n))))
          .as("gk"))
      .localCheckpoint(true)
    val crossDoc = occ.groupBy(col("gk"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .select(col("gk"))
    val shared = occ.join(crossDoc, Seq("gk"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val perDoc = shared
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(w))
      .select(col("id"),
        when(col("gap").isNull, lit(n)).otherwise(least(lit(n), col("gap")))
          .as("cov"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared_starts"),
        sum(col("cov")).as("covered_tokens"))
    toks.select(col("id"), col("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_shared_starts"), lit(0L)).as("n_shared_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("coverage_ppm",
        // the coalesce is the empty-doc guard: 0 div 0 is NULL, and an
        // empty doc is 0-covered, not null-covered
        coalesce(expr("covered_tokens * 1000000L div n_tokens"), lit(0L)))
  }
}
