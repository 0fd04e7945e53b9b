package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-source BFS: hand-graph hop distances, the unreached-stays-null
  * contract, and distributed ≡ driver replay on the real pair graph.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("doc_a", "doc_b")

  /** Driver-side replay of the exact synchronous relaxation. */
  private def replay(pairs: Seq[(Long, Long)], seeds: Long => Boolean,
      rounds: Int): Map[Long, Option[Long]] = {
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist: Map[Long, Option[Long]] =
      adj.keys.map(v => v -> (if (seeds(v)) Some(0L) else None)).toMap
    for (_ <- 1 to rounds) {
      dist = dist.map { case (v, d) =>
        val nd = adj(v).flatMap(dist(_)).map(_ + 1) match {
          case Nil => None
          case xs  => Some(xs.min)
        }
        v -> Seq(d, nd).flatten.reduceOption(_ min _)
      }
    }
    dist
  }

  test("path graph from one seed: hop-exact up to the round bound, null past it") {
    // 0-1-2-3-4-5-6: seed {0}, 4 rounds => dist 0..4, vertices 5,6 null
    val path = (0L to 5L).map(i => i -> (i + 1)).toSeq
    val got = Bfs.run(edges(path: _*), v => v === 0L, rounds = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> Some(3L), 4L -> Some(4L), 5L -> None, 6L -> None))
  }

  test("two seeds relax to the nearer one; extra rounds never change a settled distance") {
    // 1-2-3-4-5 with seeds {1, 5}: middle vertex 3 is 2 hops from both
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Bfs.run(edges(path: _*), v => v === 1L || v === 5L, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("real pair graph: distributed fold ≡ driver replay, census live") {
    val pairs = graft.queries.LlmOps.minhashLshDedup(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Bfs.run(edges(pairs: _*), v => v % 5 === 0, rounds = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === replay(pairs, _ % 5 == 0, 4))
    // seeds exist on this corpus and at least one non-seed is reached
    assert(got.values.exists(_.contains(0L)))
    assert(got.values.exists(d => d.exists(_ > 0L)))
  }
}
