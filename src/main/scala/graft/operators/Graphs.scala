package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph motif counting. Triangle counting is the standard compact-vs-
  * spam signal over a crawl graph (clustering coefficient numerator); the
  * scalable shape is the classic orient-then-join: direct every undirected
  * edge from its lower to its higher endpoint, so each triangle is counted
  * exactly once and the wedge join's fan-out per node is its ORIENTED
  * out-degree — on real (power-law) graphs orientation by degree caps the
  * hub explosion; here ids are degree-bounded by construction so id order
  * is the same cap without shipping a degree table.
  *
  * Every step is a hash-partitioned equi-join on a node id; state never
  * exceeds edge cardinality. No BNLJ, no driver collects.
  */
object Graphs {

  /** `edges`: (src, dst) long pairs, direction and duplicates ignored;
    * self-loops dropped. Returns a single row (n_edges, n_wedges,
    * n_triangles) — wedges counted on the oriented graph (a<b<c paths),
    * so n_triangles <= n_wedges and their ratio is the (oriented) closure
    * rate. */
  def triangleStats(edges: DataFrame): DataFrame = {
    // canonical undirected edge set, oriented low -> high
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    // wedges a->b->c with a<b<c; closing edge (a, c) exists => triangle
    val wedges = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e2.b").as("wc"))
    // count wedges and triangles in one pass over the wedge stream: a
    // left join onto the closing edge marks closure without a second scan
    val marked = wedges.join(
      und.select(col("a").as("wa"), col("b").as("wc"),
        lit(1L).as("closed")),
      Seq("wa", "wc"), "left")
    val e = und.agg(count(lit(1)).as("n_edges"))
    marked.agg(count(lit(1)).as("n_wedges"),
        sum(coalesce(col("closed"), lit(0L))).as("n_triangles"))
      .crossJoin(broadcast(e))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"))
  }
}
