package graft.functions

import graft.SparkSpec

/** SQL-layer access to the custom expressions via SparkSessionExtensions
  * (registered through spark.sql.extensions in the shared test session).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("word_shingles is callable from SQL and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS sh").collect()(0).getSeq[String](0)
    assert(viaSql == Seq("a b c", "b c d"))
  }

  test("gram-hash and winnow kernels are callable from SQL and match the Column API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val text = "a b c d e f g h"
    val df = Seq(text).toDF("t")
    def viaCol(c: org.apache.spark.sql.Column): Seq[Long] =
      df.select(c).collect()(0).getSeq[Long](0)
    val sqlRow = spark.sql(
      s"""SELECT word_shingle_hashes('$text', 3) AS ws,
         |       token_gram_hashes('$text', 3) AS tg,
         |       winnow_hashes('$text', 3, 4) AS wn""".stripMargin).collect()(0)
    assert(sqlRow.getSeq[Long](0) ==
      viaCol(GraftFunctions.wordShingleHashes(col("t"), 3)))
    assert(sqlRow.getSeq[Long](1) ==
      viaCol(GraftFunctions.tokenGramHashes(col("t"), 3)))
    assert(sqlRow.getSeq[Long](2) ==
      viaCol(GraftFunctions.winnowHashes(col("t"), 3, 4)))
  }

  test("token_pair_hashes from SQL equals the Column API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val text = "a b c d"
    val df = Seq(text).toDF("t")
    def pairsOf(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)))
    val viaSql = pairsOf(spark.sql(s"SELECT token_pair_hashes('$text') AS p")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0))
    val viaCol = pairsOf(df.select(GraftFunctions.tokenPairHashes(col("t")))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0))
    assert(viaSql == viaCol && viaSql.size == 3)
  }

  test("simhash60 from SQL equals Dedup.simHash") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("the quick brown fox").toDF("t")
    val viaSql = spark.sql(
      "SELECT simhash60('the quick brown fox') AS s").collect()(0).getLong(0)
    val viaCol = df.select(graft.ops.Dedup.simHash(col("t"))).collect()(0).getLong(0)
    assert(viaSql == viaCol)
  }

  test("cosine_sim / dot_prod from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_prod(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
  }

  test("repetition_stats from SQL equals the Column API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT repetition_stats('a b a b a', 2, 3).top_frac AS t")
      .collect()(0).getDouble(0)
    val viaCol = Seq("a b a b a").toDF("t")
      .select(graft.functions.GraftFunctions
        .repetitionStats(col("t"), 2, 3).getField("top_frac"))
      .collect()(0).getDouble(0)
    assert(viaSql == viaCol && viaSql == 0.5)
  }
}
