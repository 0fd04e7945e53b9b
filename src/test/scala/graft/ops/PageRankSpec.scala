package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // triangle 1-2-3 plus pendant 4 hanging off 3
  private def pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")

  test("one iteration matches the hand-computed integer update") {
    // deg: 1→2, 2→2, 3→3, 4→1; scale 100
    // rank(1) = (1500 + 85*(100//2 + 100//3)) // 100 = (1500+85*83)//100 = 85
    // rank(3) = (1500 + 85*(50+50+100)) // 100 = 185; rank(4) = (1500+85*33)//100 = 43
    val got = PageRank.run(pairs, iters = 1, scale = 100L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 85L, 2L -> 85L, 3L -> 185L, 4L -> 43L))
  }

  test("rank is partitioning-invariant (exact integers, any parallelism)") {
    val r1 = PageRank.run(pairs.repartition(1), iters = 3, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    val r7 = PageRank.run(pairs.repartition(7), iters = 3, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(r1 === r7)
    // the hub out-ranks the pendant after convergence rounds
    assert(r1(3L) > r1(4L))
  }

  test("duplicate and reversed input pairs do not change the graph") {
    val noisy = pairs.unionAll(Seq((2L, 1L), (1L, 2L)).toDF("a", "b"))
    val clean = PageRank.run(pairs, iters = 2).as[(Long, Long)].collect().toMap
    val dirty = PageRank.run(noisy, iters = 2).as[(Long, Long)].collect().toMap
    assert(clean === dirty)
  }

  test("personalized: one iteration matches the hand-computed seed-gated update") {
    // seeds (id % 2 == 0) = {2, 4}; scale 100; r0 = (0, 100, 0, 100)
    // contribs: u2 sends 100//2=50 to {1,3}; u4 sends 100//1=100 to {3}
    // rank(1) = (0 + 85*50) // 100 = 42        (non-seed, walked mass only)
    // rank(2) = (1500 + 85*0) // 100 = 15      (seed, restart only)
    // rank(3) = (0 + 85*150) // 100 = 127
    // rank(4) = (1500 + 85*0) // 100 = 15
    val got = PageRank.personalized(pairs, seedMod = 2L, iters = 1, scale = 100L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 42L, 2L -> 15L, 3L -> 127L, 4L -> 15L))
  }

  test("personalized with every vertex a seed degenerates to uniform PageRank") {
    val uni = PageRank.run(pairs, iters = 3).as[(Long, Long)].collect().toMap
    val ppr = PageRank.personalized(pairs, seedMod = 1L, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(uni === ppr)
  }

  test("personalized rank is partitioning-invariant and proximity-shaped") {
    // path 1-2-3-4-5-6 with the single seed 6 (id % 6 == 0): rank must
    // decay monotonically with distance from the seed end
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val r1 = PageRank.personalized(path.repartition(1), seedMod = 6L, iters = 4)
      .as[(Long, Long)].collect().toMap
    val r7 = PageRank.personalized(path.repartition(7), seedMod = 6L, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(r1 === r7)
    // proximity semantics (parity-safe: walked mass oscillates on a
    // path, so compare same-parity distances and the unreached end):
    // the seed outranks everyone, nearer same-parity beats farther,
    // and the far end is still unreached after 4 rounds (distance 5)
    assert(r1.maxBy(_._2)._1 === 6L, s"seed is not the top rank: $r1")
    assert(r1(4L) > r1(2L), s"distance 2 does not beat distance 4: $r1")
    assert(r1(5L) > r1(3L), s"distance 1 does not beat distance 3: $r1")
    assert(r1(1L) === 0L, s"mass crossed 5 hops in 4 rounds: $r1")
  }
}
