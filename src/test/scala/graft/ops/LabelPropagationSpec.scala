package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LPA: hand-graph community splits that CC cannot make, determinism
  * of the synchronous tie-broken fold, and the dense-cluster census on
  * the real pair graph.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("doc_a", "doc_b")

  /** Driver-side replay of the exact synchronous rule. */
  private def replay(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  test("two 4-cliques joined by one bridge edge: CC merges them, LPA keeps two communities") {
    val cliqueA = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val cliqueB = Seq((11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L), (12L, 14L), (13L, 14L))
    val g = cliqueA ++ cliqueB ++ Seq((4L, 11L)) // the bridge
    val got = LabelPropagation.run(edges(g: _*), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === replay(g, 3))
    val communities = got.groupBy(_._2).view.mapValues(_.keys.toSet).values.toSet
    assert(communities.exists(_ == Set(1L, 2L, 3L, 4L)) &&
      communities.exists(_ == Set(11L, 12L, 13L, 14L)),
      s"bridged cliques did not separate: $communities")
    // CC would give ONE component here — that separation is LPA's point
    val cc = ConnectedComponents.run(edges(g: _*))
      .select(col("root")).distinct().count()
    assert(cc === 1L)
  }

  test("real pair graph: distributed fold ≡ driver replay, census non-degenerate") {
    val pairs = graft.queries.LlmOps.minhashLshDedup(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = LabelPropagation.run(edges(pairs: _*), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === replay(pairs, 3))
    val nCommunities = got.values.toSet.size
    assert(nCommunities > 1 && nCommunities < got.size,
      s"degenerate labeling: $nCommunities communities over ${got.size} vertices")
  }
}
