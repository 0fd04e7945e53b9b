package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the cluster-
  * resolution step of near-duplicate removal: pair finders (MinHash-LSH,
  * SimHash, n-gram Jaccard) emit EDGES; keeping one canonical document
  * per duplicate *group* needs the transitive closure of those edges.
  * The component root (its minimum doc id) is the canonical survivor,
  * every other member is dropped — the standard keep-one policy, and
  * deterministic.
  *
  * Algorithm: iterative min-label propagation with pointer doubling.
  * Each round every vertex takes the min root over {itself} ∪ its
  * neighbours' roots (one shuffle join + partial-aggregated min), then
  * chases its root's root (a second join — pointer doubling). Neighbour
  * propagation alone needs O(diameter) rounds (a 1000-long crawl chain =
  * 1000 shuffles); doubling halves the remaining distance to the root
  * every round, so convergence is O(log diameter) — at 100 TB that is
  * the difference between ~40 shuffles and a job that never ends. Every
  * round's result is `localCheckpoint`ed: iterative self-joins otherwise
  * grow the lineage/plan exponentially and the optimizer re-plans the
  * whole history each round (on a cluster with a checkpoint dir,
  * `checkpoint` gives the same truncation with fault tolerance).
  *
  * Near-dup graphs in practice have tiny components (a page and its
  * mirrors), so rounds ≈ 2-3; the log bound is the insurance against the
  * adversarial case (one template chained across a whole crawl). The
  * pointer-doubling idea is the classic PRAM CC technique
  * (Shiloach-Vishkin 1982), adapted to map-reduce rounds as in Rastogi
  * et al., "Finding Connected Components in Map-Reduce in Logarithmic
  * Rounds" (ICDE 2013).
  */
object ConnectedComponents {

  /** (id, root) for every vertex that appears in `edges` (two long
    * columns, src/dst); root = min id of the vertex's component.
    * Vertices with no edges are their own root and are simply absent —
    * callers union them back if they need total coverage.
    */
  def run(edges: DataFrame, src: String = "doc_a", dst: String = "doc_b",
      maxIter: Int = 50): DataFrame = {
    // No distinct(): min-aggregation is idempotent, duplicate edges only
    // repeat a comparison — cheaper than an extra exchange to dedup them.
    val undirected = edges
      .select(col(src).cast("long").as("id"), col(dst).cast("long").as("nb"))
      .union(edges
        .select(col(dst).cast("long").as("id"), col(src).cast("long").as("nb")))
      .filter(col("id") =!= col("nb"))
    val vertices = undirected.select(col("id")).distinct()
    // Self-loops make the neighbour-min INCLUDE the vertex's own root,
    // so each round is join + groupBy-min directly — no separate
    // merge-with-previous join.
    val sym = undirected
      .union(vertices.select(col("id"), col("id").as("nb")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Seed with round 1 for free: against the identity labelling the
    // neighbour-min join degenerates to min over N(v) ∪ {v} of the
    // neighbour IDS — one aggregation over sym, no join. Stars around
    // their own min vertex (the typical near-dup cluster) are already
    // converged here; the loop then only confirms.
    var labels = sym.groupBy("id").agg(min(col("nb")).as("root"))
      .localCheckpoint()
    // Convergence via the sum of roots: labels only ever DECREASE, so an
    // unchanged sum between rounds means an unchanged labelling — one
    // tiny aggregate per round instead of a compare-join. Decimal sum:
    // billions of 64-bit ids would overflow a long.
    var converged = sym.isEmpty
    var prevSum: Any =
      if (converged) null
      else labels.agg(sum(col("root").cast("decimal(38,0)"))).collect()(0).get(0)
    var i = 0
    try {
      while (!converged && i < maxIter) {
        // 1. neighbour-min over {v} ∪ N(v) (self-loops carry v's own root)
        val stepped = sym
          .join(labels.withColumnRenamed("id", "nb"), Seq("nb"))
          .groupBy("id").agg(min(col("root")).as("root"))
        // 2. pointer doubling: root''(v) = root'(root'(v))
        val doubled = stepped
          .join(stepped.select(col("id").as("root"), col("root").as("rr")),
            Seq("root"), "left")
          .select(col("id"), coalesce(col("rr"), col("root")).as("root"))
          .localCheckpoint()
        val s = doubled.agg(sum(col("root").cast("decimal(38,0)"))).collect()(0).get(0)
        converged = s == prevSum
        prevSum = s
        labels = doubled
        i += 1
      }
    } finally sym.unpersist()
    // an unconverged labelling is WRONG (partially propagated roots) —
    // fail loudly rather than hand back plausible-looking clusters
    require(converged, s"connected components did not converge in $maxIter " +
      "rounds; raise maxIter (rounds needed ~ log2(component diameter))")
    labels
  }

  /** Incremental maintenance of a persisted cluster map: fold a new
    * batch's near-dup pairs into an existing (id, root) labelling
    * WITHOUT recomputing history. The old map is already a forest —
    * each (id, root) row is an edge — so the union of forest edges and
    * new pairs has exactly the merged components, and the iteration
    * cost scales with the forest + batch, not with every pair ever
    * seen. Old roots stay stable unless a new pair bridges two
    * clusters (then the smaller min wins, deterministically).
    */
  def merge(clusterMap: DataFrame, newPairs: DataFrame,
      src: String = "doc_a", dst: String = "doc_b",
      maxIter: Int = 50): DataFrame = {
    val forest = clusterMap.select(col("id").as(src), col("root").as(dst))
    run(forest.unionByName(
      newPairs.select(col(src).cast("long"), col(dst).cast("long"))),
      src, dst, maxIter)
  }
}
