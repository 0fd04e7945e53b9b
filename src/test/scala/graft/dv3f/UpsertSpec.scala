package graft.dv3f

import graft.SparkSpec
import graft.queries.Dv3fQueries
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** INSERT OR REPLACE BY NAME semantics (SURVEY.md §2 K3, FIXTURES.md §2):
  * last-writer-wins on uid, name-based column alignment, idempotence.
  */
class UpsertSpec extends SparkSpec {
  private def freshDir(): String =
    Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "graft-upsert")
      .resolve("src_departement").toString

  private lazy val staged =
    Reshape.transform(Dv3fQueries.fixtureWide(spark), Dv3fConfig.departement)

  test("first load inserts all rows") {
    val dir = freshDir()
    Upsert.upsertByName(spark, dir, staged, Dv3fConfig.departement)
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("reloading the same batch is idempotent (count and content)") {
    val dir = freshDir()
    Upsert.upsertByName(spark, dir, staged, Dv3fConfig.departement)
    val first = spark.read.parquet(dir).orderBy("uid").collect()
    Upsert.upsertByName(spark, dir, staged, Dv3fConfig.departement)
    val second = spark.read.parquet(dir).orderBy("uid").collect()
    assert(second === first)
  }

  test("changed metric replaces the row rather than duplicating") {
    val dir = freshDir()
    Upsert.upsertByName(spark, dir, staged, Dv3fConfig.departement)
    val changed = staged.withColumn("nbtrans",
      when(col("cod") === "111" && col("annee") === "2019", lit(9999L))
        .otherwise(col("nbtrans")))
    Upsert.upsertByName(spark, dir, changed, Dv3fConfig.departement)
    val out = spark.read.parquet(dir)
    assert(out.count() === 3)
    assert(Quality.uniqueViolations(out, "uid") === 0)
    val v = out.filter(col("cod") === "111" && col("annee") === "2019")
      .select("nbtrans").collect()(0).getLong(0)
    assert(v === 9999L)
  }

  test("BY NAME alignment: missing columns NULL-filled, extras dropped") {
    val dir = freshDir()
    val partial = staged.select("uid", "annee", "dep", "libdep", "cod", "nbtrans")
      .withColumn("not_in_schema", lit("x"))
    Upsert.upsertByName(spark, dir, partial, Dv3fConfig.departement)
    val out = spark.read.parquet(dir)
    assert(out.schema.fieldNames.toSeq ===
      Dv3fConfig.departement.schema.fieldNames.toSeq)
    assert(out.filter(col("valeurfonc_sum").isNotNull).count() === 0)
  }

  test("quality checks pass on the loaded staging table") {
    val dir = freshDir()
    Upsert.upsertByName(spark, dir, staged, Dv3fConfig.departement)
    val checks = Quality.stagingChecks(
      spark.read.parquet(dir), Dv3fConfig.departement)
    assert(checks.forall(_.passed), checks.filterNot(_.passed).mkString(", "))
  }
}
