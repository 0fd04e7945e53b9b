package graft.ops

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

/** Code-switch census: a constructed bilingual document is flagged
  * with the exact switch count while monolingual siblings are not, and
  * the real-corpus census obeys its arithmetic invariants.
  */
class CodeSwitchSpec extends SparkSpec {
  import spark.implicits._

  test("constructed corpus: the bilingual doc is the only mixed one, with exactly one switch point") {
    val en = "the cat sat on the mat and the dog ran to the house " +
      "with the ball near the tree" // 20 en tokens
    val fr = "le chat est sur le tapis et le chien court vers la maison " +
      "avec la balle pres de arbre" // 20 fr tokens
    val docs = Seq(
      // training signal: several clean docs per language
      (1L, "en", "srcA", s"$en $en"),
      (2L, "en", "srcA", en),
      (3L, "fr", "srcA", s"$fr $fr"),
      (4L, "fr", "srcA", fr),
      // the code-switched doc: window 0 english, window 1 french
      (5L, "en", "srcB", s"$en $fr"),
      // a monolingual two-window control in the same source
      (6L, "en", "srcB", s"$en $en")
    ).toDF("doc_id", "lang", "source", "text")
    val got = LlmOps.codeSwitchCensusOver(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // srcA: 4 monolingual docs, zero mixed, zero switches
    assert(got("srcA")._2 === 0L && got("srcA")._3 === 0L)
    // srcB: 2 docs, exactly the planted one mixed, exactly 1 switch
    assert(got("srcB") === ((2L, 1L, 1L, 4L)),
      s"expected the planted bilingual doc alone, got ${got("srcB")}")
  }

  test("real corpus: census arithmetic invariants hold") {
    val rows = LlmOps.codeSwitchCensus(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(rows.map(_._2).sum === docs.count())
    rows.foreach { case (src, nDocs, mixed, switches, nWin) =>
      assert(mixed <= nDocs, src)
      assert(switches >= mixed, s"$src: a mixed doc implies >= 1 switch")
      assert(mixed > 0 || switches == 0L, s"$src: switches without mixed docs")
      assert(nWin >= nDocs, s"$src: every doc has >= 1 window")
    }
    // window totals recomputed independently: sum of ceil(tokens/20)
    val expectWin = docs
      .select(col("source"),
        ceil(size(split(trim(col("text")), "\\s+")) / lit(20.0))
          .cast("long").as("nw"))
      .groupBy("source").agg(sum("nw").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, _, _, _, nWin) =>
      assert(nWin === expectWin(src), s"$src window total drifted")
    }
  }
}
