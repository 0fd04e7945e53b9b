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
    *
    * Tiered execution: an edge list that fits comfortably on the driver
    * (≤ `localThreshold` rows; the default 2^19 is ~8 MB of long pairs,
    * the same order as Spark's broadcast-join threshold) is collected
    * and solved with a local union-find. The distributed loop costs
    * ~10 scheduler/AQE stage waves REGARDLESS of data size — seconds of
    * fixed latency that dwarf a sub-megabyte graph — while the local
    * solve is microseconds and produces the identical labelling (min-id
    * root, same keep-one policy). Near-dup graphs are sparse (dups are
    * the exception), so even large corpora often land under the
    * threshold after pair finding; anything bigger takes the iterative
    * log-round path below, which is the 100 TB story. Pass
    * `localThreshold = 0` to force the distributed path (the property
    * tests do, so both tiers stay covered).
    */
  def run(edges: DataFrame, src: String = "doc_a", dst: String = "doc_b",
      maxIter: Int = 50, localThreshold: Int = 1 << 19): DataFrame = {
    if (localThreshold > 0) {
      // take(n+1) answers "does it fit" and "give me the rows" in one
      // execution; if the graph is over-threshold the probe cost is
      // bounded by the threshold itself.
      val probe = edges
        .select(col(src).cast("long"), col(dst).cast("long"))
        .filter(col(src) =!= col(dst))
        .take(localThreshold + 1)
      if (probe.length <= localThreshold) {
        import edges.sparkSession.implicits._
        return localUnionFind(probe.map(r => (r.getLong(0), r.getLong(1))))
          .toSeq.toDF("id", "root")
      }
    }
    runDistributed(edges, src, dst, maxIter)
  }

  /** Min-id-root union-find with path halving — the local tier of
    * [[run]]. Labels every vertex with its component's minimum id.
    */
  private def localUnionFind(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = new java.util.HashMap[Long, java.lang.Long](pairs.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      if (p == null) { parent.put(x, x); return x }
      while (p != x) { // path halving keeps chains near-flat
        val gp = parent.get(p.longValue)
        parent.put(x, gp)
        x = gp
        p = parent.get(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = Map.newBuilder[Long, Long]
    parent.keySet.forEach { v => out += (v.longValue -> find(v.longValue)) }
    out.result()
  }

  private def runDistributed(edges: DataFrame, src: String, dst: String,
      maxIter: Int): DataFrame = {
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
        // Persisted: the doubling step references it on BOTH sides of the
        // self-join, and without a materialization point the join+agg
        // subtree would execute twice per round (ReuseExchange is not
        // guaranteed across the two branches).
        val stepped = sym
          .join(labels.withColumnRenamed("id", "nb"), Seq("nb"))
          .groupBy("id").agg(min(col("root")).as("root"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // 2. pointer doubling: root''(v) = root'(root'(v))
        val doubled = stepped
          .join(stepped.select(col("id").as("root"), col("root").as("rr")),
            Seq("root"), "left")
          .select(col("id"), coalesce(col("rr"), col("root")).as("root"))
          .localCheckpoint() // eager: materialized here, so stepped can go
        stepped.unpersist(blocking = false)
        val s = doubled.agg(sum(col("root").cast("decimal(38,0)"))).collect()(0).get(0)
        converged = s == prevSum
        prevSum = s
        // The superseded round's localCheckpoint blocks are released by
        // Spark's ContextCleaner once the old Dataset is unreachable (the
        // var reassignment drops the only reference); at worst O(log
        // diameter) label sets (~40 × |V| longs) are live between GCs,
        // MEMORY_AND_DISK so they spill rather than evict working memory.
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
    * WITHOUT recomputing history. Old roots stay stable unless a new
    * pair bridges two clusters (then the smaller min wins,
    * deterministically).
    *
    * The iterative CC never sees the forest: each batch endpoint is
    * first RELABELLED to its existing root (one join per side against
    * the map — the map is already a forest of depth 1, so one hop
    * fully contracts it), pairs that land inside one existing cluster
    * drop out, and [[run]] iterates only the CONTRACTED graph, whose
    * vertices are the touched roots plus genuinely-new ids. The new
    * root of a touched OLD root then joins back onto the map in one
    * pass. Cost: two batch-sized joins + CC over a batch-sized graph +
    * one map-sized relabel join — the map itself is never iterated,
    * which is the difference between "merge cost ∝ crawl delta" and
    * "merge cost ∝ corpus" at 100 TB.
    *
    * Output covers every clusterMap vertex (roots included — run()
    * emits (r, r) rows, so a map produced by run()/merge() is total
    * over its vertices) plus every batch-pair endpoint, matching a
    * from-scratch run() over forest ∪ batch edges. Unlike that
    * formulation, externally-supplied singleton rows (id == root with
    * no other member) are PRESERVED, not silently dropped.
    */
  def merge(clusterMap: DataFrame, newPairs: DataFrame,
      src: String = "doc_a", dst: String = "doc_b",
      maxIter: Int = 50): DataFrame = {
    val map = clusterMap
      .select(col("id").cast("long").as("id"), col("root").cast("long").as("root"))
    val pairs = newPairs
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // contract: endpoint -> its existing root (identity for unseen ids).
    // The batch is delta-sized, so AQE broadcasts it against the map.
    val contracted = pairs
      .join(map.select(col("id").as("a"), col("root").as("ra")), Seq("a"), "left")
      .join(map.select(col("id").as("b"), col("root").as("rb")), Seq("b"), "left")
      .select(coalesce(col("ra"), col("a")).as("ca"),
        coalesce(col("rb"), col("b")).as("cb"))
      .filter(col("ca") =!= col("cb"))
    // CC over roots + new ids only — batch-sized, not corpus-sized
    val sub = run(contracted, "ca", "cb", maxIter)
    // map rows follow their root's new label; untouched roots coalesce
    // through. sub is batch-sized -> broadcast against the map scan.
    val relabelled = map
      .join(sub.select(col("id").as("root"), col("root").as("nr")), Seq("root"), "left")
      .select(col("id"), coalesce(col("nr"), col("root")).as("root"))
    // genuinely-new vertices (batch ids absent from the map)
    val fresh = sub.join(map.select("id"), Seq("id"), "left_anti")
    relabelled.unionByName(fresh)
  }
}
