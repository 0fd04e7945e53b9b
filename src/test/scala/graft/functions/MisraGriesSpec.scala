package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries: the superset guarantee on a constructed Zipf stream
  * (k < vocab so evictions occur), the undercount bound, the mergeable
  * rule, and face ≡ exact-threshold groupBy on the real corpus.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish: item i (1..100) appears ceil(3000/i) times → N ≈ 15k,
  // heavy head, long tail; k = 20 forces constant eviction.
  private val zipf: Seq[Long] =
    (1 to 100).flatMap(i => Seq.fill(3000 / i + 1)(i.toLong))

  test("every item above N/(k+1) survives the sketch; counters undercount by ≤ N/(k+1)") {
    val k = 20
    val n = zipf.length.toLong
    val exact = zipf.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val agg = new MisraGriesAggregator(k)
    // fold in a deliberately adversarial order (interleaved shuffle of
    // 4 partitions merged pairwise) to stress merge-order independence
    val parts = zipf.zipWithIndex.groupBy(_._2 % 4).values
      .map(p => p.map(_._1).foldLeft(agg.zero)(agg.reduce)).toList
    val merged = parts.reduce(agg.merge)
    val cands = agg.finish(merged).items.toSet
    val bound = n / (k + 1)
    exact.foreach { case (item, cnt) =>
      if (cnt > bound)
        assert(cands.contains(item), s"$item (cnt=$cnt > $bound) evicted")
    }
    merged.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item overcounted: $est > ${exact(item)}")
      assert(exact(item) - est <= bound,
        s"$item undercount ${exact(item) - est} > bound $bound")
    }
    assert(cands.size <= k)
  }

  test("real corpus face ≡ exact threshold recomputation, and is partitioning-invariant") {
    val got = graft.queries.SketchOps.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // exact recomputation without the sketch
    val grams = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(expr("substring(text, i, 3)").as("gram"))
    val n = grams.count()
    val exact = grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 200 >= n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === exact)
    assert(got.nonEmpty, "no heavy hitters at sf0.001 — dead face")
    // the packed-code path assumes an ASCII corpus — pin it
    val maxCp = graft.Tables.load(spark, sf, "documents")
      .select(max(expr("array_max(transform(split(text, ''), c -> ascii(c)))")))
      .head.getInt(0)
    assert(maxCp < 128, s"corpus is not ASCII (max codepoint $maxCp)")
  }
}
