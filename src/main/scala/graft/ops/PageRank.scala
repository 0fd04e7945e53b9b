package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected pair graph — the
  * importance/centrality face of the dedup similarity graph (rank the
  * canonical documents of a near-dup neighborhood, weight domains by
  * link mass, pick representatives for inspection).
  *
  * Arithmetic is INTEGER-EXACT by construction: ranks are scaled to
  * `scale` and every step is
  *
  *   rank'(v) = (15*scale + 85 * sum_{u~v} (rank(u) div deg(u))) div 100
  *
  * — all positive int64 with floor division, so the result is
  * bit-identical across engines and partitionings (float PageRank is
  * neither: summation order changes low bits). The damping split 85/100
  * is the usual 0.85.
  *
  * Shape at scale: `iters` rounds of (edges ⋈ rank) + an aggregation on
  * dst — each round is one shuffle join keyed by vertex, the same
  * data-proportional loop as ConnectedComponents but with a FIXED
  * iteration count (rank is a fixpoint query only in the limit; fixed
  * rounds is the standard batch formulation). The degree table is
  * computed once and pinned. Symmetric graphs have no dangling nodes,
  * so no mass-leak term is needed.
  */
object PageRank {

  /** @param pairs one row per undirected edge (a, b) — first two
    *              columns; duplicates are removed after symmetrization
    */
  def run(pairs: DataFrame, iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val Seq(a, b) = pairs.columns.toSeq.take(2).map(col)
    val edges = CacheBin.pin(
      pairs.select(a.as("src"), b.as("dst"))
        .unionAll(pairs.select(b.as("src"), a.as("dst")))
        .distinct())
    val deg = CacheBin.pin(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    var rank = deg.select(col("src").as("id"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      rank = edges
        .join(rank, edges("src") === rank("id"))
        .join(deg, "src")
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("mass"))
        .select(col("dst").as("id"),
          expr(s"(${15L * scale} + 85 * mass) div 100").as("rank"))
    }
    rank
  }

  /** PERSONALIZED PageRank: the restart mass goes only to the seed set
    * (vertices with `id % seedMod == 0` — a deterministic predicate so
    * both engines name the same seeds), not uniformly — the standard
    * topic-sensitive / random-walk-with-restart variant (Haveliwala
    * WWW'02): rank measures proximity TO THE SEEDS, the
    * "expand-from-these-known-good-documents" face of retrieval and
    * graph-based curation.
    *
    * Same integer-exact floor-division update as [[run]], with the
    * restart term gated per vertex:
    *
    *   rank'(v) = (15*scale*[v ∈ S] + 85 * sum_{u~v} (rank(u) div deg(u))) div 100
    *
    * and r0(v) = scale*[v ∈ S]. Non-seed vertices start at 0 and
    * accumulate only walked mass, so far-from-seed vertices rank ~0 —
    * exactly the personalization semantics. Same shape at scale as
    * [[run]]: `iters` vertex-keyed shuffle-join rounds over a pinned
    * edge/degree pair; the seed predicate is a free map-side CASE.
    */
  def personalized(pairs: DataFrame, seedMod: Long, iters: Int = 3,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(seedMod >= 1, "seedMod must be >= 1")
    val Seq(a, b) = pairs.columns.toSeq.take(2).map(col)
    val edges = CacheBin.pin(
      pairs.select(a.as("src"), b.as("dst"))
        .unionAll(pairs.select(b.as("src"), a.as("dst")))
        .distinct())
    val deg = CacheBin.pin(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    var rank = deg.select(col("src").as("id"),
      expr(s"CASE WHEN src % $seedMod = 0 THEN ${scale}L ELSE 0L END")
        .as("rank"))
    for (_ <- 1 to iters) {
      rank = edges
        .join(rank, edges("src") === rank("id"))
        .join(deg, "src")
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("mass"))
        .select(col("dst").as("id"),
          expr(s"(CASE WHEN dst % $seedMod = 0 THEN ${15L * scale}L ELSE 0L END" +
            s" + 85 * mass) div 100").as("rank"))
    }
    rank
  }
}
