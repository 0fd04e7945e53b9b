package graft.dv3f

import graft.SparkSpec
import graft.queries.Dv3fQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden test of the DV3F transform (FIXTURES.md §1-2): the exact three
  * staging rows, including sha256 uid hex values, plus the semantic edge
  * cases SURVEY.md §7.4 calls out.
  */
class ReshapeSpec extends SparkSpec {
  private lazy val out =
    Reshape.transform(Dv3fQueries.fixtureWide(spark), Dv3fConfig.departement)
      .orderBy("uid").collect()

  test("golden: three staging rows with exact uids") {
    assert(out.length === 3)
    val byUid = out.map(r => r.getString(0) -> r).toMap
    assert(byUid.keySet === Set(
      "32bc516f9b46ee38b1cab9caca15fd987b83fcddcf12707555e21f4b0ce03c79", // 2019+85+111
      "7e0920e4be96f7ae7ba8ebd80917aaa2a4dbe54f4756c83ad41ad9e0e288db41", // 2019+85+121
      "454d4b3cb995682778941247b78329a980442bbb2e98a4ce40d645ff2bfb8096")) // 2020+85+111
  }

  test("golden: full row for (2019, 85, 111)") {
    val r = out.find(_.getString(0).startsWith("32bc")).get
    assert(r === Row(
      "32bc516f9b46ee38b1cab9caca15fd987b83fcddcf12707555e21f4b0ce03c79",
      "2019", "85", "Vendée", "111",
      7543L, 1.23e9, 98000.0, 152000.0, 231000.0, 1450.5, 1980.0, 2610.75,
      812345.0, 95.0))
  }

  test("missing metrics and explicit nulls become typed NULL cells") {
    val r121 = out.find(_.getString(4) == "121").get
    // valeurfonc_median was an explicit null in the payload; q25/q75 etc.
    // were absent entirely — all land as NULL
    assert(r121.isNullAt(r121.fieldIndex("valeurfonc_median")))
    assert(r121.isNullAt(r121.fieldIndex("valeurfonc_q25")))
    assert(r121.getLong(r121.fieldIndex("nbtrans")) === 312L)
    assert(r121.getDouble(r121.fieldIndex("pxm2_median")) === 2100.0)
  }

  test("pandas dropna semantics: all-null groups do not appear") {
    // (2020, 85, 121) has no non-null metric → no row
    assert(!out.exists(r => r.getString(1) == "2020" && r.getString(4) == "121"))
  }

  test("declared schema: column order and types are pinned") {
    val df = Reshape.transform(Dv3fQueries.fixtureWide(spark), Dv3fConfig.departement)
    assert(df.schema.fieldNames.toSeq ===
      Dv3fConfig.departement.schema.fieldNames.toSeq)
    assert(df.schema("nbtrans").dataType.typeName === "long")
    assert(df.schema("valeurfonc_sum").dataType.typeName === "double")
  }

  test("splitCod strips all 'cod' occurrences (reference replace semantics)") {
    import spark.implicits._
    val in = Seq("m_codcod9").toDF("cod_full")
    val got = Reshape.splitCod(in).select("cod").as[String].collect()
    assert(got === Array("9")) // both 'cod's removed, like str.replace
  }

  test("splitCod splits on the LAST underscore only") {
    import spark.implicits._
    val in = Seq("valeurfonc_sum_cod121").toDF("cod_full")
    val got = Reshape.splitCod(in).select("cod_full", "cod").collect()(0)
    assert(got === Row("valeurfonc_sum", "121"))
  }

  test("region scope uses reg id vars in the uid hash") {
    val wide = spark.createDataFrame(
      java.util.Arrays.asList(Row("2019", "52", "Pays de la Loire", 10.0)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("annee", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("reg", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("libreg", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("nbtrans_cod111", org.apache.spark.sql.types.DoubleType))))
    val got = Reshape.transform(wide, Dv3fConfig.region)
    val uid = got.select("uid").collect()(0).getString(0)
    val exp = java.security.MessageDigest.getInstance("SHA-256")
      .digest("201952111".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(uid === exp)
  }
}
