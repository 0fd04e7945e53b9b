package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected edge list — the graph-curation
  * companion to [[ConnectedComponents]]: where CC tells you WHICH docs
  * form a duplicate cluster, the k-core tells you which docs sit in the
  * densely-duplicated HEART of the graph (every member near-duplicates
  * ≥ k other members, recursively). Training-data pipelines use it to
  * rank template farms / boilerplate nests above incidental pairs when
  * deciding what to hand-audit or drop first.
  *
  * Algorithm: bulk-synchronous peel (the standard distributed
  * formulation of Matula–Beck degeneracy peeling). Each round drops
  * every vertex of degree < k together with its edges; surviving
  * degrees shrink, so the edge set is monotonically decreasing and the
  * fixpoint is the exact k-core. `rounds` bounds the sweeps: callers
  * pass the measured convergence depth (near-dup graphs are
  * shallow — dedup clusters are mostly cliques plus pendant vertices,
  * which one round removes; the q_kcore face converges in ≤ 2 rounds at
  * every test sf and the third is an idempotence witness). A bounded
  * sweep count is also what makes the DuckDB oracle constructible: the
  * oracle unrolls the same rounds as CTEs, so round-for-round
  * equivalence is hash-checked, not just the final set.
  *
  * Scale shape (100 TB near-dup graph): each round is ONE degree
  * aggregation (vertex-keyed exchange with map-side combine — edges
  * contribute two partial rows that collapse before shuffling) plus two
  * LEFT SEMI joins of the edge list against the surviving-vertex set,
  * both keyed on the vertex id the degree exchange already established.
  * Nothing is ever collected to the driver; the surviving set shrinks
  * monotonically so later rounds cost less, and a fixed round count
  * means a fixed number of stages — no data-dependent driver loop. The
  * peeled edge set is pinned per round ([[CacheBin]]) so round r+1's
  * degree aggregate does not recompute rounds 1..r.
  */
object KCore {

  /** Peel `rounds` times; returns surviving vertices with their
    * in-core degree: (v, deg_in_core). Edges must be (doc_a, doc_b)
    * with doc_a < doc_b (no self-loops, no duplicate orientation) —
    * the contract the dedup pair generators already guarantee.
    *
    * CONVERGENCE IS CHECKABLE FROM THE RESULT: the peel reached its
    * fixpoint (the result IS the exact k-core) iff no surviving vertex
    * has deg_in_core < k — peeling never removes a true k-core member,
    * and a survivor set whose minimum degree is ≥ k is exactly the
    * maximal k-core. An under-specified `rounds` on a deeper graph
    * therefore does NOT fail silently: [[notConverged]] (one filter
    * over the result) surfaces the violating vertices, and production
    * callers should assert it is empty (or re-peel with more rounds)
    * before trusting the core.
    *
    * Tiered like [[ConnectedComponents.run]]: a broadcast-sized edge
    * list (≤ `localThreshold` rows — near-dup graphs are sparse) is
    * collected and peeled on the driver, because the distributed loop
    * costs ~5 scheduler/AQE stage waves PER ROUND regardless of data
    * size — seconds of fixed latency that dwarf a sub-megabyte graph —
    * while the local peel is microseconds and bit-identical. Pass
    * `localThreshold = 0` to force the distributed path (the specs do,
    * so both tiers stay covered).
    */
  def peel(edges: DataFrame, k: Int, rounds: Int,
      localThreshold: Int = 1 << 19): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    if (localThreshold > 0) {
      val probe = edges.select(col("doc_a").cast("long"),
        col("doc_b").cast("long")).take(localThreshold + 1)
      if (probe.length <= localThreshold) {
        import edges.sparkSession.implicits._
        return localPeel(probe.map(r => (r.getLong(0), r.getLong(1))),
          k, rounds).toSeq.toDF("v", "deg_in_core")
      }
    }
    var e = edges.select(col("doc_a"), col("doc_b"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k)
      e = CacheBin.pin(
        e.join(keep.select(col("v").as("doc_a")), Seq("doc_a"), "left_semi")
          .join(keep.select(col("v").as("doc_b")), Seq("doc_b"), "left_semi")
          .select(col("doc_a"), col("doc_b")))
    }
    degrees(e).select(col("v"), col("deg").as("deg_in_core"))
  }

  /** Fixpoint probe for a [[peel]] result: the vertices whose in-core
    * degree is still < k. Empty ⟺ the peel converged and the result is
    * the exact k-core (see the convergence note on [[peel]]); non-empty
    * means `rounds` under-specified the graph's peel depth and exactly
    * these vertices (at least) still need peeling.
    */
  def notConverged(core: DataFrame, k: Int): DataFrame =
    core.filter(col("deg_in_core") < k)

  /** The local tier of [[peel]]: the identical rounds-bounded sweep on
    * a driver-resident edge array.
    */
  private def localPeel(pairs: Array[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var e = pairs.toSeq
    for (_ <- 1 to rounds) {
      val deg = e.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      e = e.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
    }
    e.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
  }

  /** Vertex degrees of an undirected edge list: each edge contributes
    * one partial row per endpoint; map-side combine collapses them
    * before the single vertex-keyed exchange.
    */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("doc_a").as("v"))
      .union(e.select(col("doc_b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
}
