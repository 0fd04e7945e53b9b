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
    for (_ <- 1 to rounds) {
      val viaNbr = und
        .join(dist.withColumnRenamed("v", "dst"), Seq("dst"))
        .filter(col("dist").isNotNull)
        .groupBy(col("src").as("v")).agg(min(col("dist") + 1).as("nd"))
      // least() with a NULL side differs across engines; the symmetric
      // double-coalesce is the exact tree the oracle replays
      dist = CacheBin.pin(dist.join(viaNbr, Seq("v"), "left")
        .select(col("v"),
          least(coalesce(col("dist"), col("nd")),
            coalesce(col("nd"), col("dist"))).as("dist")))
    }
    dist
  }
}
