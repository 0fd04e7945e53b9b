package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-source BFS hop distance over an undirected edge list — the
  * contamination-radius primitive on the near-dup graph: given a seed
  * set (docs matched against a benchmark, flagged by an auditor, named
  * in a takedown), "how many hops of near-duplication separate every
  * other doc from the seed set" is the question a quarantine policy
  * answers with ("drop everything within 2 hops, review 3").
  * Completes the graph family: [[ConnectedComponents]] (reachability),
  * [[KCore]] (density), [[LabelPropagation]] (communities),
  * [[Triangles]] (closure) — BFS adds DISTANCE.
  *
  * Synchronous Bellman-Ford-style relaxation, `rounds` fixed sweeps
  * (the [[KCore]]/[[LabelPropagation]] bounded-sweep convention — the
  * oracle unrolls the identical rounds as materialized CTEs, so the
  * fold is checked round-for-round): round r's frontier table holds
  * min(dist) per vertex computed from the full round-(r−1) table.
  * Vertices beyond `rounds` hops stay NULL — reported, not guessed.
  *
  * Scale shape: each round is one dst-keyed join of the edge list
  * against the |V|-sized distance table, one src-keyed min with
  * map-side combine, and one |V|-keyed left join — all keyed exchanges
  * on graph-sized relations (the near-dup graph is cluster-sized, ∝
  * duplicated docs, not corpus-sized), no driver loop, rounds pinned
  * via [[CacheBin]] so round r+1 never recomputes 1..r. For
  * high-diameter graphs the pointer-doubling variant
  * ([[ConnectedComponents]]) bounds rounds at O(log d); hop-exact
  * distance wants the literal sweeps, and quarantine radii are small
  * constants.
  */
object Bfs {

  /** `rounds` synchronous relaxations; returns (v, dist) with dist
    * NULL where the seed set is farther than `rounds` hops. Edges must
    * be the canonical (doc_a < doc_b) pair relation; `isSeed` is
    * evaluated against the vertex id column.
    */
  def run(edges: DataFrame, isSeed: Column => Column, rounds: Int): DataFrame = {
    val und = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var dist = und.select(col("src").as("v")).distinct()
      .withColumn("dist",
        when(isSeed(col("v")), 0L).otherwise(lit(null).cast(LongType)))
    var prev = (-1L, Long.MinValue)
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      // one exchange per round: the neighbor candidates (dist+1 via the
      // dst-keyed edge join) UNION the previous distances, then a
      // v-keyed min — min() skips NULLs, so an unreached vertex with no
      // reached neighbor keeps NULL, and a reached one keeps its
      // settled minimum. Value-equivalent to the two-join
      // (min-aggregate + left-join + least) formulation the oracle
      // unrolls. Pinned per round: the next round references this
      // table twice, and AQE replanning defeats ReusedExchange dedup
      // (measured: the pin-free lineage re-evaluated rounds
      // multiplicatively).
      val viaNbr = und
        .join(dist.withColumnRenamed("v", "dst"), Seq("dst"))
        .filter(col("dist").isNotNull)
        .select(col("src").as("v"), (col("dist") + 1).as("d"))
      dist = CacheBin.pin(dist.select(col("v"), col("dist").as("d"))
        .unionByName(viaNbr)
        .groupBy(col("v")).agg(min(col("d")).as("dist")))
      // EARLY STOP at the fixpoint: distances only ever go null→finite
      // or decrease, so (assigned count, assigned sum) is strictly
      // monotone under any change — equality with the previous round
      // proves every remaining round is the identity. The oracle still
      // unrolls the full `rounds` (fixed-round CTEs, the KCore
      // convention): post-fixpoint rounds are identities, so values
      // agree exactly. One graph-sized aggregate on the just-pinned
      // table per round — far cheaper than running identity rounds of
      // joins on a small-diameter graph.
      val row = dist.agg(count(col("dist")).as("c"), sum(col("dist")).as("s")).head
      val sig = (row.getLong(0),
        if (row.isNullAt(1)) Long.MinValue else row.getLong(1))
      converged = sig == prev
      prev = sig
      r += 1
    }
    dist
  }
}
