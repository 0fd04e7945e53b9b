package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkRowsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g"),
    (2L, "x"),
    (3L, ""),                 // one empty token (split semantics)
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("generator emits the same rows as tokenChunks + posexplode") {
    val gen = docs.select(col("doc_id"),
        GraftFunctions.chunkRows(col("text"), 3, 2).as(Seq("chunk_idx", "chunk")))
      .collect().map(_.toSeq).toSet
    val arr = docs.select(col("doc_id"),
        posexplode(GraftFunctions.tokenChunks(col("text"), 3, 2))
          .as(Seq("chunk_idx", "chunk")))
      .collect().map(_.toSeq).toSet
    assert(gen == arr && gen.nonEmpty)
  }

  test("chunk windows overlap by window-stride and truncate at the end") {
    val got = docs.filter($"doc_id" === 1L)
      .select(GraftFunctions.chunkRows(col("text"), 3, 2).as(Seq("i", "c")))
      .as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0, "a b c"), (1, "c d e"), (2, "e f g"), (3, "g")))
  }

  test("null generates no rows; empty text generates one empty chunk (split semantics)") {
    val got = docs.filter($"doc_id" >= 3L)
      .select(col("doc_id"),
        GraftFunctions.chunkRows(col("text"), 3, 2).as(Seq("i", "c")))
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((3L, 0, "")))
  }

  test("chunk_rows is usable from SQL via LATERAL VIEW") {
    docs.createOrReplaceTempView("chunk_rows_docs")
    val got = spark.sql(
      """SELECT doc_id, chunk_idx, chunk FROM chunk_rows_docs
        |LATERAL VIEW chunk_rows(text, 3, 2) AS chunk_idx, chunk
        |WHERE doc_id = 2""".stripMargin)
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((2L, 0, "x")))
  }
}
