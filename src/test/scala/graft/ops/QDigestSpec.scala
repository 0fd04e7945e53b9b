package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Q-digest: geometry, count conservation, the paper's size and rank-
  * error guarantees on the real event stream, merge associativity with
  * the rollup face, and estimate-vs-exact ordering.
  */
class QDigestSpec extends SparkSpec {

  private def eventDist(dir: String = sf): Map[String, Map[Long, Long]] =
    graft.Tables.loadEvents(spark, dir)
      .select(col("event_type"),
        least(greatest(floor(col("value")).cast("long"), lit(1L)),
          lit(QDigest.U.toLong)).as("v"))
      .groupBy(col("event_type"), col("v")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.map(t => t._2 -> t._3).toMap }

  test("geometry: leaves map to unit spans, ancestors to aligned dyadic ranges, clamping holds") {
    (1L to 1024L by 97).foreach { v =>
      assert(QDigest.span(QDigest.leafOf(v)) === ((v, v)))
    }
    assert(QDigest.leafOf(0) === QDigest.leafOf(1))
    assert(QDigest.leafOf(99999) === QDigest.leafOf(1024))
    assert(QDigest.span(1L) === ((1L, 1024L))) // root covers the domain
    assert(QDigest.span(2L) === ((1L, 512L)))
    assert(QDigest.span(3L) === ((513L, 1024L)))
  }

  test("compress conserves mass, meets the paper's size bound, and is deterministic") {
    // sf0.01: per-type n ≈ 2000 puts τ = n/K at 7, so family merges
    // actually fire (at sf0.001 τ = 0 and compress is correctly the
    // identity — asserted below)
    eventDist("/root/testdata/sf0.01").foreach { case (scope, d) =>
      val n = d.values.sum
      val leaves = d.map { case (v, c) => QDigest.leafOf(v) -> c }
      val dig = QDigest.compress(leaves, n)
      assert(dig.values.sum === n, s"$scope lost mass")
      assert(dig.size < leaves.size, s"$scope: no compression happened")
      assert(dig.size <= 3 * QDigest.K, s"$scope exceeds the 3k size bound")
      assert(QDigest.compress(leaves, n) === dig, s"$scope nondeterministic")
    }
    // under-threshold streams compress to themselves (τ = 0, strict <)
    eventDist().foreach { case (scope, d) =>
      val leaves = d.map { case (v, c) => QDigest.leafOf(v) -> c }
      assert(QDigest.compress(leaves, d.values.sum) === leaves,
        s"$scope: τ=0 compress must be the identity")
    }
  }

  test("rank guarantee on the real stream: est >= exact, true rank within log2(U)*n/K of the target") {
    val dists = eventDist()
    val all = dists.values.flatten.groupMapReduce(_._1)(_._2)(_ + _)
    val cases = dists.toSeq.map { case (s, d) =>
      (s, d, QDigest.compress(d.map { case (v, c) => QDigest.leafOf(v) -> c },
        d.values.sum))
    } :+ (("ALL", all, QDigest.merge(dists.values.toSeq.map(d =>
      QDigest.compress(d.map { case (v, c) => QDigest.leafOf(v) -> c },
        d.values.sum)))))
    cases.foreach { case (scope, d, dig) =>
      val n = d.values.sum
      assert(dig.values.sum === n, s"$scope merge/compress lost mass")
      Seq(50, 90, 99).foreach { pct =>
        val est = QDigest.quantile(dig, n, pct)
        val exact = QDigest.exactQuantile(d, n, pct)
        assert(est >= exact, s"$scope p$pct underestimates: $est < $exact")
        val t = QDigest.target(n, pct)
        val rankBelowEst = d.filter(_._1 < est).values.sum
        assert(rankBelowEst < t + QDigest.logU.toLong * n / QDigest.K,
          s"$scope p$pct rank error beyond the paper bound")
      }
      // and the estimate is never vacuous at the median on this stream
      if (scope != "ALL")
        assert(QDigest.quantile(dig, n, 50) < QDigest.U)
    }
  }

  test("quantile estimates are monotone in the percentile") {
    eventDist().foreach { case (scope, d) =>
      val n = d.values.sum
      val dig = QDigest.compress(
        d.map { case (v, c) => QDigest.leafOf(v) -> c }, n)
      val qs = Seq(1, 10, 25, 50, 75, 90, 99, 100)
        .map(QDigest.quantile(dig, n, _))
      qs.sliding(2).foreach { case Seq(a, b) =>
        assert(a <= b, s"$scope quantiles not monotone: $qs") }
    }
  }

  test("rollup face: ALL row is the digest MERGE; every row pairs est with exact") {
    val got = graft.queries.SketchOps.sketchQdigest(spark, sf).collect()
    assert(got.map(_.getString(0)).contains("ALL"))
    got.foreach { r =>
      assert(r.getLong(3) >= r.getLong(4), s"p50 under exact in ${r.getString(0)}")
      assert(r.getLong(5) >= r.getLong(6), s"p90 under exact in ${r.getString(0)}")
      assert(r.getLong(7) >= r.getLong(8), s"p99 under exact in ${r.getString(0)}")
      assert(r.getLong(2) <= 3 * QDigest.K)
    }
    val allRow = got.find(_.getString(0) == "ALL").get
    assert(allRow.getLong(1) === got.filter(_.getString(0) != "ALL")
      .map(_.getLong(1)).sum, "ALL n_events != sum of scopes")
  }
}
