package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and bpeishCount") {
    val got = Seq("  hello, world! two  spaces ")
      .toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishCount(col("text")).as("bpe"))
      .collect()(0)
    assert(got.getInt(0) === 4) // hello, world! two spaces
    assert(got.getInt(1) === 6) // hello , world ! two spaces
  }

  test("langId picks the language with most marker hits, ties by priority") {
    val got = Seq(
      ("en", "the cat of the house is big and warm"),
      ("fr", "le chat et la maison les bois des champs"),
      ("de", "der hund und die katze das ist gut"),
      ("es", "el perro y los gatos las casas es grande"))
      .toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("bagFingerprint is word-order invariant; rollingFingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.bagFingerprint(col("t1")) === TextAnalysis.bagFingerprint(col("t2")),
      TextAnalysis.rollingFingerprint(col("t1")) === TextAnalysis.rollingFingerprint(col("t2")))
      .collect()(0)
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
  }

  test("quality signals: exact ratios on a constructed doc") {
    val got = TextAnalysis.withQualitySignals(
      Seq("the cat, the dog!").toDF("text"), col("text")).collect()(0)
    assert(got.getInt(got.fieldIndex("n_chars")) === 17)
    assert(got.getInt(got.fieldIndex("n_tokens")) === 4)
    // tokens: the cat, the dog! → lens 3+4+3+4 = 14/4
    assert(got.getDouble(got.fieldIndex("mean_token_len")) === 3.5)
    // 'the' twice of 4 tokens
    assert(got.getDouble(got.fieldIndex("stopword_ratio")) === 0.5)
    // ',' and '!' of 17 chars
    assert(got.getDouble(got.fieldIndex("punct_ratio")) === 2.0 / 17)
  }

  test("analyzeDocuments runs over testdata and keeps one row per doc") {
    val df = TextAnalysis.analyzeDocuments(spark, sf)
    assert(df.count() === df.select("doc_id").distinct().count())
    assert(df.columns.toSet.contains("lang_pred"))
  }
}
