package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.LlmOps

/** Trained quality classifier: deterministic fit, real distillation
  * lift over the majority baseline, and application ≡ a driver-side
  * replay of the fitted tree over raw strings.
  */
class QualityModelSpec extends SparkSpec {

  private def labeled = TextAnalysis.gopherVerdicts(
    Tables.load(spark, sf, "documents").select(col("doc_id"), col("text")),
    col("text"))
    .select(col("doc_id"), col("text"), col("keep").as("label"))

  test("fit is deterministic (same tree twice, including tie-breaks)") {
    val a = QualityModel.fit(labeled, col("text"), col("label"))
    val b = QualityModel.fit(labeled, col("text"), col("label"))
    assert(a == b)
  }

  test("distillation lift: accuracy strictly above the majority-class baseline") {
    val out = LlmOps.qualityClassifier(spark, sf).collect()
    val n = out.length.toDouble
    val acc = out.count(r => r.getBoolean(1) == r.getBoolean(2)) / n
    val pos = out.count(_.getBoolean(1)) / n
    val baseline = math.max(pos, 1 - pos)
    assert(acc > baseline,
      s"accuracy $acc not above majority baseline $baseline")
  }

  test("column application equals a driver-side replay of the fitted tree") {
    val tree = QualityModel.fit(labeled, col("text"), col("label"))
    def feats(text: String): Map[String, Long] = Map(
      "n_chars" -> text.length.toLong,
      "n_digit" -> "[0-9]".r.findAllIn(text).length.toLong,
      "n_punct" -> "[^\\w\\s]".r.findAllIn(text).length.toLong,
      "n_tokens" -> text.trim.split("\\s+").length.toLong)
    def replay(text: String): Boolean = {
      val f = feats(text)
      val rs = f(tree.root.feature) <= tree.root.thr
      val c = if (rs) tree.left else tree.right
      tree.leaf((rs, f(c.feature) <= c.thr))
    }
    val rows = labeled
      .select(col("doc_id"), col("text"),
        QualityModel.predictCol(col("text"), tree).as("pred"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(2) == replay(r.getString(1)),
        s"doc ${r.getLong(0)} diverges from the driver replay")
    }
  }

  test("the surrogate features discriminate: the tree is not a constant") {
    val out = LlmOps.qualityClassifier(spark, sf).collect()
    assert(out.exists(_.getBoolean(2)) && out.exists(!_.getBoolean(2)),
      "fitted tree predicts a single class everywhere")
  }
}
