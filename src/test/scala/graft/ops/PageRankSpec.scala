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
}
