package graft.ops

import graft.SparkSpec
import graft.queries.Maintenance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-k IVM: maintain ≡ recompute on the real corpus, both regimes
  * (buffer-served and rescanned groups) live, and — via poisoned
  * fixtures — proof that the rescan leg reads ONLY the touched groups
  * and that a partial buffer never rescans.
  */
class IvmTopKSpec extends SparkSpec {
  import spark.implicits._

  private def df3(rows: Seq[(Long, Double, Long)]): DataFrame =
    rows.toDF("annee", "v", "k")

  private def ch(rows: Seq[(Long, Option[Double], Option[Double], Long)]): DataFrame =
    rows.toDF("annee", "old_v", "new_v", "k")

  test("hand fixture: buffer-full deletes rescan; interior delete and partial buffer do not (poisoned base)") {
    // group 10: FULL buffer (k'=6), two buffer deletes → survivors 4 < 5 → rescan
    // group 20: full buffer, one BELOW-floor delete + one insert → served from buffer
    // group 30: PARTIAL buffer (3 rows = whole group), delete → still no rescan
    val buf = df3(Seq(
      (10L, 100.0, 1L), (10L, 90.0, 2L), (10L, 80.0, 3L), (10L, 70.0, 4L),
      (10L, 60.0, 5L), (10L, 50.0, 6L),
      (20L, 200.0, 11L), (20L, 190.0, 12L), (20L, 180.0, 13L),
      (20L, 170.0, 14L), (20L, 160.0, 15L), (20L, 150.0, 16L),
      (30L, 10.0, 21L), (30L, 9.0, 22L), (30L, 8.0, 23L)))
    val changes = ch(Seq(
      (10L, Some(100.0), None, 1L), (10L, Some(90.0), None, 2L),
      (20L, Some(130.0), None, 18L), (20L, None, Some(195.0), 19L),
      (30L, Some(10.0), None, 21L)))
    // groups 20/30 are POISONED in the mutated base: if the maintain
    // path ever rescans them, the sentinel rows surface and the compare
    // fails — only group 10 may be read from base.
    val mutated = df3(Seq(
      (10L, 80.0, 3L), (10L, 70.0, 4L), (10L, 60.0, 5L), (10L, 50.0, 6L),
      (10L, 40.0, 7L), (10L, 30.0, 8L),
      (20L, 999.0, 99L), (30L, 999.0, 98L)))
    val rescan = Maintenance.ivmTopKNeedRescan(buf, changes)
      .collect().map(_.getLong(0)).toSet
    assert(rescan === Set(10L))
    val got = Maintenance.ivmTopKMaintain(buf, changes, mutated).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val expected = Seq(
      (10L, 1L, 3L, 80.0), (10L, 2L, 4L, 70.0), (10L, 3L, 5L, 60.0),
      (10L, 4L, 6L, 50.0), (10L, 5L, 7L, 40.0),
      (20L, 1L, 11L, 200.0), (20L, 2L, 19L, 195.0), (20L, 3L, 12L, 190.0),
      (20L, 4L, 13L, 180.0), (20L, 5L, 14L, 170.0),
      (30L, 1L, 22L, 9.0), (30L, 2L, 23L, 8.0))
    assert(got === expected)
  }

  test("real corpus: maintain ≡ independent Spark recompute from the mutated base") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("annee")).orderBy(col("v").desc, col("k").asc)
    val expected = Maintenance.ivmTopKMutatedBase(spark, sf)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= Maintenance.topK)
      .select(col("annee"), col("rnk"), col("k").as("o_key"), col("v"))
      .collect().map(_.toString).sorted.toSeq
    val got = Maintenance.ivmTopK(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === expected)
  }

  test("real corpus: both regimes live — some groups rescan, some serve from the buffer") {
    val buf = Maintenance.ivmTopKBuffer(spark, sf)
    val groups = buf.select("annee").distinct().count()
    val rescans = Maintenance.ivmTopKNeedRescan(buf,
      Maintenance.ivmMinMaxChangeRows(spark, sf)).count()
    assert(rescans > 0, "no group rescans — the hard case is dead on this corpus")
    assert(rescans < groups, s"all $groups groups rescan — the buffer absorbs nothing")
  }
}
