package graft.ops

import graft.SparkSpec
import graft.queries.{LlmOps, SketchOps}

import scala.util.Random

class KCoreSpec extends SparkSpec {

  /** localThreshold = 0 forces the distributed loop; the default takes
    * the driver tier. Tests run through both (same pattern as
    * ConnectedComponentsSpec).
    */
  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int,
      localThreshold: Int = 1 << 19): Map[Long, Long] = {
    import spark.implicits._
    KCore.peel(edges.toDF("doc_a", "doc_b"), k, rounds, localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference: peel to fixpoint; returns (core degrees, sweep count to
    * convergence — the first idempotent sweep included).
    */
  private def refCore(edges: Seq[(Long, Long)], k: Int): (Map[Long, Long], Int) = {
    var e = edges.toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter { case (a, b) => keep(a) && keep(b) }
      rounds += 1
      changed = e2 != e
      e = e2
    }
    val coreDeg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    (coreDeg, rounds)
  }

  for ((tier, th) <- Seq("local" -> (1 << 19), "distributed" -> 0)) {
    test(s"[$tier] triangle with a pendant: pendant peels, triangle survives with degree 2") {
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      assert(peel(edges, k = 2, rounds = 3, th) ===
        Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    }

    test(s"[$tier] a 7-vertex chain dissolves completely under k=2 within 3 rounds") {
      val edges = (0L until 6L).map(i => (i, i + 1))
      assert(peel(edges, k = 2, rounds = 3, th) === Map.empty[Long, Long])
    }

    test(s"[$tier] extra rounds past the fixpoint change nothing (idempotence)") {
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      assert(peel(edges, k = 2, rounds = 3, th) ===
        peel(edges, k = 2, rounds = 5, th))
    }
  }

  for ((tier, th) <- Seq("local" -> (1 << 19), "distributed" -> 0)) {
    test(s"[$tier] notConverged: non-empty under too-few rounds, empty at the fixpoint") {
      import spark.implicits._
      // a 7-chain under k=2 needs 3 sweeps to dissolve; after 1 sweep
      // the ends are gone but survivors still carry degree-1 vertices —
      // exactly the signal notConverged must surface
      val edges = (0L until 6L).map(i => (i, i + 1))
      val partial = KCore.peel(edges.toDF("doc_a", "doc_b"), k = 2,
        rounds = 1, th)
      assert(KCore.notConverged(partial, 2).count() > 0,
        "under-specified rounds produced no convergence signal")
      val full = KCore.peel(edges.toDF("doc_a", "doc_b"), k = 2,
        rounds = 3, th)
      assert(KCore.notConverged(full, 2).count() === 0)
    }
  }

  test("both tiers agree with the exact k-core on random graphs at rounds >= depth") {
    val rng = new Random(7)
    for (trial <- 1 to 3) {
      val n = 14
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rng.nextDouble() < 0.18
      } yield (a, b)).toSeq
      for (k <- Seq(2, 3)) {
        val (want, depth) = refCore(edges, k)
        assert(peel(edges, k, depth) === want,
          s"trial $trial k=$k depth=$depth edges=$edges (local)")
        assert(peel(edges, k, depth, localThreshold = 0) === want,
          s"trial $trial k=$k depth=$depth edges=$edges (distributed)")
      }
    }
  }

  test("q_dedup_kcore face (sf0.01): matches a driver-side fixpoint peel of the LSH graph") {
    val dir = "/root/testdata/sf0.01"
    val edges = LlmOps.minhashLshDedup(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (want, depth) = refCore(edges, 2)
    assert(depth <= 3, s"peel needs $depth rounds; raise q_dedup_kcore's bound")
    val got = SketchOps.dedupKcore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty, "sf0.01 LSH graph is known to contain a 2-core")
    assert(got.values.forall(_ >= 2))
  }
}
