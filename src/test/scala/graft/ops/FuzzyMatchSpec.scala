package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("blockedPairs finds within-block pairs under the distance cap") {
    val df = Seq(
      "cold bolt", "old bolt", "hot bolt", // bolt block
      "red widget",                        // widget block (alone)
      "hot gear", "cold gear"              // gear block
    ).toDF("name")
    val got = FuzzyMatch.blockedPairs(df, col("name"),
        element_at(split(col("name"), " "), -1), maxDist = 3)
      .as[(String, String, Int)].collect().toSet
    assert(got === Set(
      ("cold bolt", "old bolt", 1),
      ("hot bolt", "old bolt", 3),
      // "cold bolt" vs "hot bolt" is 3 edits (c->h, delete o, delete l... )
      ("cold bolt", "hot bolt", 3),
      ("cold gear", "hot gear", 3)))
  }

  test("blockedPairs never compares across blocks, even when close") {
    // 1 edit apart but different last token → different block → no pair
    val df = Seq("hot rod", "hot rad").toDF("name")
    val got = FuzzyMatch.blockedPairs(df, col("name"),
      element_at(split(col("name"), " "), -1), maxDist = 3)
    assert(got.count() === 0)
  }

  test("blockedPairs runs on the distinct-value dimension") {
    // 1000 duplicate rows of two names must yield exactly one pair
    val df = (1 to 1000).flatMap(_ => Seq("old bolt", "cold bolt")).toDF("name")
    val got = FuzzyMatch.blockedPairs(df, col("name"),
      element_at(split(col("name"), " "), -1), maxDist = 2)
    assert(got.count() === 1)
  }

  test("lengthBand: values within maxDist edits land in adjacent bands") {
    val d = 2
    val got = Seq(("abcdef", "abcd"))
      .toDF("a", "b")
      .select(FuzzyMatch.lengthBand(col("a"), d).as("ba"),
        FuzzyMatch.lengthBand(col("b"), d).as("bb"))
      .collect()(0)
    // lengths 6 and 4 (2 edits apart) → bands 2 and 1: adjacent
    assert(math.abs(got.getLong(0) - got.getLong(1)) <= 1)
  }
}
