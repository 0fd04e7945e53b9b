package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * standard graph-shape statistic for a near-dup graph (a dedup cluster
  * dense in triangles is a true duplicate family; a sparse, triangle-free
  * one is chained false positives, worth a higher verify threshold).
  *
  * Algorithm: degree-ordered edge orientation (node-iterator++). Each
  * undirected edge is directed from its lower-(degree, id) endpoint to
  * the higher; wedges are enumerated by self-joining oriented edges on
  * their source, and a wedge closes into a triangle iff its two tips are
  * an edge. Orientation is the scale lever: every out-neighborhood is
  * bounded by O(sqrt(|E|)) (arboricity bound), so the wedge join
  * fan-out is near-linear in edges even when the raw graph has
  * celebrity vertices — the naive shared-neighbor join on such a vertex
  * would square its degree. Each triangle is counted exactly once (its
  * orientation-minimal vertex owns it).
  *
  * Plan shape: degree agg (one exchange on vertex) -> two broadcastable
  * degree joins -> wedge self-join keyed on src (one exchange) ->
  * left-semi close against the canonical edge set. No cartesian
  * products; everything partial-aggregates.
  */
object Triangles {

  /** One-row graph stats (n_edges, n_wedges, n_triangles) for a
    * canonical edge list: columns (doc_a, doc_b), doc_a < doc_b, no
    * duplicate rows.
    */
  def stats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("doc_a"), col("doc_b"))
    val deg = e.select(col("doc_a").as("v"))
      .union(e.select(col("doc_b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

    val aFirst = // orient doc_a -> doc_b ?
      col("da") < col("db") || (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val oriented = e
      .join(deg.select(col("v").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(deg.select(col("v").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
      .select(
        when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("src"),
        when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("dst"))

    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.dst").as("u"), col("y.dst").as("w"))

    // one pass over the wedge stream: count wedges and closed wedges
    // (= triangles) in the same aggregate, so the wedge join runs once
    val closed = wedges
      .join(e.select(col("doc_a"), col("doc_b"), lit(1L).as("hit")),
        least(col("u"), col("w")) === col("doc_a") &&
          greatest(col("u"), col("w")) === col("doc_b"),
        "left")
      .agg(count(lit(1)).as("n_wedges"),
        coalesce(sum(col("hit")), lit(0L)).as("n_triangles"))

    e.agg(count(lit(1)).as("n_edges")).crossJoin(closed)
  }
}
