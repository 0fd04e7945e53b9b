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

  test("constructed corpus: the bilingual doc splits into exactly its two planted spans") {
    val en = "the cat sat on the mat and the dog ran to the house " +
      "with the ball near the tree" // 20 en tokens
    val fr = "le chat est sur le tapis et le chien court vers la maison " +
      "avec la balle pres de arbre" // 20 fr tokens
    val docs = Seq(
      (1L, "en", "srcA", s"$en $en"),
      (2L, "en", "srcA", en),
      (3L, "fr", "srcA", s"$fr $fr"),
      (4L, "fr", "srcA", fr),
      // the strings are 19 tokens each, so "$en $en $fr" = 57 tokens =
      // 3 windows: 0 all-en, 1 en-majority (18 en + 2 fr), 2 all-fr
      // (17 tokens) → an en run over windows 0-1, an fr run at 2
      (5L, "en", "srcB", s"$en $en $fr"),
      (6L, "en", "srcB", s"$en $en")
    ).toDF("doc_id", "lang", "source", "text")
    val rows = LlmOps.codeSwitchSplitOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6)))
    // only the mixed doc is split, into exactly its two language runs,
    // and the spans conserve the 57-token total (40 + 17)
    assert(rows.toSeq === Seq(
      (5L, 1L, "en", 0, 1, 2L, 40L),
      (5L, 2L, "fr", 2, 2, 1L, 17L)), rows.mkString(", "))
  }

  test("real corpus: split conservation law — span tokens sum to doc tokens, spans alternate") {
    val spans = LlmOps.codeSwitchSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6)))
    // consistency with the census: exactly the mixed docs get split
    val mixedTotal = LlmOps.codeSwitchCensus(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(spans.map(_._1).distinct.length.toLong === mixedTotal,
      "split docs must be exactly the census's mixed docs")
    val docToks = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val ordered = ss.sortBy(_._2)
      // Σ span tokens ≡ doc tokens (nothing gained or lost)
      assert(ordered.map(_._7).sum === docToks(doc), s"doc $doc token drift")
      // spans tile the window axis: start at 0, contiguous, ≥2 spans,
      // adjacent spans disagree on lang (else they'd be one run)
      assert(ordered.length >= 2, s"doc $doc: a mixed doc has >= 2 spans")
      assert(ordered.head._4 === 0, s"doc $doc: first span starts at window 0")
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 === a._5 + 1, s"doc $doc: span gap between ${a._5} and ${b._4}")
        assert(a._3 !== b._3, s"doc $doc: adjacent spans share a lang")
      }
      ordered.foreach { s =>
        assert(s._6 === (s._5 - s._4 + 1).toLong, s"doc $doc span_windows drift")
      }
    }
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
