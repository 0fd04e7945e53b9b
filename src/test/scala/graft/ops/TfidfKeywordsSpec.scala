package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** TF-IDF keywords: a term shared by every doc must never outrank a
  * doc-specific term, scores replay the exact integer idf tree, and the
  * face covers every doc with exactly k ranked rows.
  */
class TfidfKeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("doc-specific term beats the corpus-wide stopword; exact score replay") {
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    // 'the' appears in all 3 docs; 'zebra' only in doc 1 (twice)
    Seq(
      (1L, "the zebra zebra runs", "en", "a", 20L),
      (2L, "the cat sleeps", "en", "a", 15L),
      (3L, "the dog barks", "en", "a", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmOps.tfidfKeywords(spark, dir, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // N=3: zebra tf=2 df=1 → 2·(2·2+1)/3 = 10/3; 'the' tf=1 df=3 → 1/7
    assert(got(1L)._1 === "zebra")
    assert(math.abs(got(1L)._2 - BigDecimal(10.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(2L)._1 != "the" && got(3L)._1 != "the")
  }

  test("real corpus: every doc gets exactly k rows, ranks dense from 1") {
    val k = 3
    val rows = LlmOps.tfidfKeywords(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length === nDocs * k)
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.values.forall(_.map(_._2).sorted.sameElements(1L to k)))
  }
}
