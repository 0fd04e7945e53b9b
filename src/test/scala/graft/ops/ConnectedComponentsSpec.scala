package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ConnectedComponentsSpec extends SparkSpec {

  /** localThreshold = 0 forces the distributed loop; the default takes
    * the driver union-find tier. Tests run the suite through both.
    */
  private def cc(edges: Seq[(Long, Long)], localThreshold: Int = 1 << 19): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("doc_a", "doc_b"),
      localThreshold = localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Brute-force union-find, the oracle for the property test. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: root = min id of the component
    val members = parent.keys.toSeq.groupBy(find)
    members.flatMap { case (_, ms) =>
      val root = ms.min; ms.map(_ -> root)
    }.toMap
  }

  for ((tier, th) <- Seq("local" -> (1 << 19), "distributed" -> 0)) {
    test(s"[$tier] two disjoint triangles resolve to their min ids") {
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L))
      assert(cc(edges, th) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
    }

    test(s"[$tier] a 33-vertex chain converges (doubling beats O(diameter))") {
      // min-label propagation alone needs 32 rounds here; with doubling
      // the run must finish well under the 50-iteration cap.
      val edges = (0L until 32L).map(i => (i, i + 1))
      val got = cc(edges, th)
      assert(got.size === 33 && got.values.forall(_ == 0L))
    }

    test(s"[$tier] self-loops and duplicate edges change nothing") {
      val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L))
      // (5,5) is dropped (no real edge -> vertex absent), duplicates merge
      assert(cc(edges, th) === Map(1L -> 1L, 2L -> 1L))
    }

    test(s"[$tier] empty edge list yields empty labels") {
      import spark.implicits._
      assert(ConnectedComponents.run(
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
        localThreshold = th).isEmpty)
    }
  }

  test("both tiers agree on random graphs") {
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 18L), Gen.choose(0L, 18L)))
    val params = Gen.Parameters.default
    (1 to 4).foreach { i =>
      val edges = edgeGen.pureApply(params, Seed(500L + i))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) assert(cc(edges, 0) === cc(edges))
    }
  }

  test("merge folds new pairs into an existing map: bridge + stability") {
    import spark.implicits._
    val oldMap = ConnectedComponents.run(
      Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("doc_a", "doc_b"))
    val merged = ConnectedComponents.merge(
      oldMap, Seq((2L, 5L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (2,5) bridges {1,2} and {5,6} under root 1; {8,9} is untouched
    assert(merged === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  test("merge(run(p1), p2) equals run(p1 ++ p2) on random splits") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
    val params = Gen.Parameters.default
    (1 to 4).foreach { i =>
      val all = edgeGen.pureApply(params, Seed(100L + i))
        .filter { case (a, b) => a != b }
      val (p1, p2) = all.splitAt(all.length / 2)
      if (p1.nonEmpty && p2.nonEmpty) {
        val incremental = ConnectedComponents.merge(
          ConnectedComponents.run(p1.toDF("doc_a", "doc_b")),
          p2.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(incremental === cc(all))
      }
    }
  }

  test("matches brute-force union-find on random graphs") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
    val params = Gen.Parameters.default
    (1 to 8).foreach { i =>
      val edges = edgeGen.pureApply(params, Seed(i.toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) assert(cc(edges) === unionFind(edges))
    }
  }
}
