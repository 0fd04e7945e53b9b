package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skyline: the sort-based prefix-max identity must reproduce the
  * defining quadratic dominance semantics exactly — ties, strictness,
  * duplicates and all — and the distributed scan must not smuggle in a
  * single-partition pass over the corpus.
  */
class SkylineSpec extends SparkSpec {

  /** Brute-force dominance over a (id, price, size) frame. */
  private def brute(rows: Seq[(Long, Double, Long)]): Set[(Long, Double, Long)] =
    rows.filter { p =>
      !rows.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.toSet

  test("hand fixture: ties, duplicates, and equal-price columns") {
    import spark.implicits._
    // (1) dominated strictly; (2)(3) equal (price,size) duplicates — both
    // stay; (4)(5) same price, different size — only the max survives;
    // (6) cheapest, small — stays (nothing cheaper); (7) dominated by (6)
    val rows = Seq(
      (1L, 50.0, 10L), (2L, 40.0, 12L), (3L, 40.0, 12L),
      (4L, 60.0, 20L), (5L, 60.0, 15L), (6L, 10.0, 3L), (7L, 20.0, 3L))
    val df = rows.toDF("p_partkey", "price", "size")
    val tmp = java.nio.file.Files.createTempDirectory("skyline_fix").toString
    df.select(col("p_partkey"), lit("n").as("p_name"), lit("b").as("p_brand"),
        lit("t").as("p_type"), col("size").cast("int").as("p_size"),
        col("price").as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = Skyline.skyline(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === brute(rows))
    assert(got.contains((2L, 40.0, 12L)) && got.contains((3L, 40.0, 12L)),
      "equal (price,size) duplicates dominate nothing strictly — both stay")
    assert(!got.contains((5L, 60.0, 15L)) && got.contains((4L, 60.0, 20L)),
      "within one price, only the max size survives")
  }

  test("real corpus: identity ≡ brute-force dominance, non-degenerate") {
    val part = graft.Tables.load(spark, sf, "part")
      .select(col("p_partkey").as("id"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size"))
    val rows = part.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val got = Skyline.skyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === brute(rows))
    assert(got.size > 1 && got.size < rows.size,
      s"degenerate skyline (${got.size} of ${rows.size})")
  }

  test("grouped skyline: per-brand frontier ≡ per-brand brute force; global ⊆ union of grouped") {
    val part = graft.Tables.load(spark, sf, "part")
      .select(col("p_brand"), col("p_partkey").as("id"),
        col("p_retailprice").as("price"), col("p_size").cast("long").as("size"))
    val rows = part.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).flatMap { case (b, rs) =>
      brute(rs.map(t => (t._2, t._3, t._4)).toSeq).map(t => (b, t._1, t._2, t._3))
    }.toSet
    val got = Skyline.skylineByBrand(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === expected)
    // a global skyline point is undominated within its own brand too
    val global = Skyline.skyline(spark, sf).collect().map(_.getLong(0)).toSet
    assert(global.subsetOf(got.map(_._2)))
  }

  test("plan: no cartesian product, no corpus-sized single-partition exchange") {
    val plan = Skyline.skyline(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only SinglePartition allowed is the final presentation sort's
    // range partitioning; the prefix scan itself must be range/hash
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
