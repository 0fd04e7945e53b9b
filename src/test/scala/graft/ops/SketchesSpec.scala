package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups × known distinct cardinalities (g0: 1000, g1: 100, g2: 7)
  private lazy val df = (
    (1 to 5000).map(i => ("g0", (i % 1000).toLong)) ++
    (1 to 2000).map(i => ("g1", (i % 100).toLong)) ++
    (1 to  500).map(i => ("g2", (i % 7).toLong))
  ).toDF("g", "v")

  test("approx_count_distinct is within the rsd bound of exact") {
    val approx = Sketches.approxDistinct(df, Seq($"g"), $"v", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Sketches.exactDistinct(df, Seq($"g"), $"v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, nd) =>
      val rel = math.abs(approx(g).toDouble - nd) / nd
      assert(rel <= 0.06, s"group $g: approx=${approx(g)} exact=$nd rel=$rel")
    }
  }

  test("percentile_approx brackets the exact quantiles") {
    val got = Sketches.approxQuantiles(df.filter($"g" === "g0"), Nil, $"v",
      Seq(0.25, 0.5, 0.75), accuracy = 10000)
      .collect()(0).getSeq[Long](0)
    // v is uniform over 0..999 in g0
    assert(math.abs(got(0) - 250) <= 5 && math.abs(got(1) - 500) <= 5 &&
      math.abs(got(2) - 750) <= 5, s"got $got")
  }

  test("freqItems finds the planted heavy hitter") {
    val skewed = df.select(when($"v" < 3, lit(-1L)).otherwise($"v").as("v"))
    val items = Sketches.frequentItems(skewed, Seq("v"), minSupport = 0.2)
      .collect()(0).getSeq[Long](0)
    assert(items.contains(-1L), s"heavy hitter missing from $items")
  }
}
