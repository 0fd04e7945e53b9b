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

  test("repetitionStats: exact fractions on constructed docs") {
    val rep = graft.functions.GraftFunctions
      .repetitionStats(col("text"), nSmall = 2, nLarge = 3)
    val rows = Seq(
      // tokens: a b a b a -> bigrams [ab, ba, ab, ba]: top 2/4, dup 1-2/4
      //         trigrams [aba, bab, aba]: dup 1-2/3
      "a b a b a",
      // all-distinct bigrams/trigrams -> top 1/3, dup 0, dup3 0
      "w x y z",
      // too short for any gram -> all null
      "solo")
      .toDF("text")
      .select(col("text"), rep.getField("top_frac").as("t"),
        rep.getField("dup_frac").as("d2"),
        rep.getField("dup_large_frac").as("d3"))
      .collect()
    val byText = rows.map(r => r.getString(0) -> r).toMap
    val r1 = byText("a b a b a")
    assert(r1.getDouble(1) === 0.5 && r1.getDouble(2) === 0.5 &&
      r1.getDouble(3) === 1.0 - 2.0 / 3)
    val r2 = byText("w x y z")
    assert(r2.getDouble(1) === 1.0 / 3 && r2.getDouble(2) === 0.0 &&
      r2.getDouble(3) === 0.0)
    val r3 = byText("solo")
    assert(r3.isNullAt(1) && r3.isNullAt(2) && r3.isNullAt(3))
  }

  test("gopherVerdicts: each rule fails on its own counterexample") {
    // 25 tokens of the right shape that passes everything
    val good = (Seq.fill(10)("the quick") :+ "brown fox and dogs is").mkString(" ")
    val cases = Seq(
      ("good", good),
      ("short", "the cat is a dog"),                       // < 20 tokens
      ("longwords", Seq.fill(8)("extraordinarily extraordinarily the a")
        .mkString(" ")),                                   // mean len 8.5 > 5
      ("symbols", (Seq.fill(5)("# # # the cat") :+ "a of and is x y z w q r")
        .mkString(" ")),                                   // sym ratio > 0.1
      ("nostop", Seq.fill(25)("lorem ipsum").mkString(" "))) // 0 stopwords
    val got = TextAnalysis.gopherVerdicts(
        cases.toDF("id", "text"), col("text"))
      .select(col("id"), col("rule_word_count"), col("rule_mean_word_len"),
        col("rule_symbol_ratio"), col("rule_stopwords"), col("keep"))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    assert(got("good") === ((true, true, true, true, true)))
    assert(got("short")._1 === false && got("short")._5 === false)
    assert(got("longwords")._2 === false && got("longwords")._5 === false)
    assert(got("symbols")._3 === false && got("symbols")._5 === false)
    assert(got("nostop")._4 === false && got("nostop")._5 === false)
  }

  test("unigramLmTopK: common-token docs outscore rare-token docs, exactly") {
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    // corpus: 'common' appears 4x, 'rare' 1x, 'other' 1x → total 6 tokens
    // (fixture carries the full documents schema — Tables.load asserts
    // the expected column set at load since the r10 drift guard)
    Seq((1L, "common common"), (2L, "common common"), (3L, "rare other"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.unigramLmTopK(spark, dir, k = 10)
      .select(col("doc_id"), col("score_num"), col("lm_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 1,2: score_num = 2*4+... = 8, lm = 8/(2*6); doc 3: 1+1=2, 2/(2*6)
    assert(got.take(2).map(_._1).toSet === Set(1L, 2L))
    assert(got.take(2).forall(t => t._2 === 8L && t._3 === 8.0 / 12.0))
    assert(got(2) === ((3L, 2L, 2.0 / 12.0)))
  }

  test("bigramLmTopK: interpolated score is exact; <2-token docs drop") {
    val dir = java.nio.file.Files.createTempDirectory("bigram").toString
    // bigrams: docs 1,2 both emit ('a b') → cf('a b') = 2, total_b = 2;
    // doc 3 has one token → no bigram row → dropped at the inner join.
    // unigrams: a×2, b×2, c×1 → total_u = 5.
    Seq((1L, "a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.bigramLmTopK(spark, dir, k = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    // per doc: bi_num = 1·2 = 2, n_bi = 1; uni_num = 1·2 + 1·2 = 4, n_uni = 2
    // lm = 0.75·(2/(1·2)) + 0.25·(4/(2·5)) = 0.75 + 0.1 = 0.85
    assert(got.forall(t => t._2 === 1L && t._3 === 2L && t._4 === 4L))
    assert(got.forall(t => t._5 === 0.75 * (2.0 / (1.0 * 2.0)) +
      0.25 * (4.0 / (2.0 * 5.0))))
  }

  test("tokenPairHashes kernel equals zipping the order-1 hash stream with its tail") {
    val cases = Seq("a b c d", "a", "", "  x\ty \n z  ", "a a a", "solo pair")
    val rows = cases.toDF("text").select(
      graft.functions.GraftFunctions.tokenPairHashes(col("text")).as("p"),
      graft.functions.GraftFunctions.tokenGramHashes(col("text"), 1).as("g"))
      .collect()
    rows.foreach { r =>
      val pairs = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getLong(0), x.getLong(1)))
      val g = r.getSeq[Long](1)
      assert(pairs == g.zip(g.drop(1)), s"pair stream != zip for g=$g")
    }
  }

  test("knBigramTopK: Kneser-Ney statistic is exact and conserves probability mass") {
    val dir = java.nio.file.Files.createTempDirectory("knbigram").toString
    // pair table: (a,b)×2, (a,c)×1, (b,c)×1 → N1+(··)=3;
    // histories: a (c_prev 3, 2 types), b (c_prev 1, 1 type);
    // continuations: b seen after 1 history, c after 2.
    Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.knBigramTopK(spark, dir, k = 10)
      .collect().map(r => ((r.getLong(2), r.getLong(3), r.getLong(5)),
        (r.getLong(4), r.getDouble(6)))).toMap
    assert(got.size === 3)
    // keyed by (c_big, c_prev, n1_back); values (n1_fwd, p_kn) in the
    // engine's exact expression tree
    assert(got((2L, 3L, 1L)) === ((2L,
      (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)))) // p(b|a)
    assert(got((1L, 3L, 2L)) === ((2L,
      (1.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (2.0 / 3.0)))) // p(c|a)
    assert(got((1L, 1L, 2L)) === ((1L,
      (1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (2.0 / 3.0)))) // p(c|b) = 0.75
    // absolute discounting conserves mass: over the SEEN continuations
    // of a history the probabilities sum to ≤ 1, with equality exactly
    // when every corpus continuation type is attested for that history
    // (history a) and strict reservation otherwise (history b)
    val pa = got((2L, 3L, 1L))._2 + got((1L, 3L, 2L))._2
    assert(math.abs(pa - 1.0) < 1e-12, s"history a covers all types: $pa")
    assert(got((1L, 1L, 2L))._2 < 1.0)
    // every probability is positive: c ≥ 1 makes c − 0.75 ≥ 0.25
    assert(got.values.forall(_._2 > 0.0))
  }

  test("langIdNbConfusion: the fit separates disjoint-vocabulary languages") {
    val dir = java.nio.file.Files.createTempDirectory("langid").toString
    Seq((1L, "bonjour le monde le monde", "fr"), (2L, "hello world the world", "en"),
      (3L, "le monde bonjour", "fr"), (4L, "the world hello", "en"),
      (5L, "hello le world", "en")) // 2 en tokens vs 1 fr -> en
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.langIdNbConfusion(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("en", "en", 3L), ("fr", "fr", 2L)))
  }

  test("langIdNbConfusion: exact score ties break to the alphabetically first language") {
    val dir = java.nio.file.Files.createTempDirectory("langid_tie").toString
    // both langs have the identical model (one 'x', total 1): every
    // candidate score ties, so both docs must predict 'en'
    Seq((1L, "x", "en"), (2L, "x", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.langIdNbConfusion(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("en", "en", 1L), ("fr", "en", 1L)))
  }

  test("langIdNbConfusion: census is total over the corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val census = graft.queries.LlmOps.langIdNbConfusion(spark, sf).collect()
    assert(census.map(_.getLong(2)).sum === docs.count())
    // every true language appears, and predictions stay in-alphabet
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(census.map(_.getString(0)).toSet === langs)
    assert(census.map(_.getString(1)).toSet.subsetOf(langs))
  }

  test("dsirSample: target-like docs outscore raw-only docs, exactly") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    // one shared bigram feature ('x y') seen in en once and overall
    // twice; one raw-only feature ('p q'); n_t = 1, n_r = 3
    Seq((1L, "x y", "en"), (2L, "x y", "fr"), (3L, "p q", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.dsirSample(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // docs 1, 2 share the en-attested feature: (1·3)/(2·1) = 1.5;
    // doc 3's feature never occurs in the target → score 0
    assert(got.toSeq === Seq(
      (1L, 1L, 2L, 1.5), (2L, 1L, 2L, 1.5), (3L, 0L, 1L, 0.0)))
  }

  test("outlierMad: per-lang median/MAD flags only the true outlier") {
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    // en lengths {10,12,14,16,1000}: med 14, absdev {4,2,0,2,986},
    // mad 2 → 2-MAD bound is 14 ± 4, strict > keeps absdev 4 inside;
    // only 1000 flags. fr is all-identical (mad 0): any deviation would
    // flag, none exists.
    val rows = Seq((1L, 10L, "en"), (2L, 12L, "en"), (3L, 14L, "en"),
      (4L, 16L, "en"), (5L, 1000L, "en"), (6L, 7L, "fr"), (7L, 7L, "fr"))
    rows.map { case (id, n, lang) => (id, "t" * n.toInt, lang, n) }
      .toDF("doc_id", "text", "lang", "n_chars")
      .withColumn("source", lit("spec"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.outlierMad(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq((5L, "en", 1000L, 14.0, 2.0)))
  }

  test("bpePairCounts: pair counts weighted by word frequency; 1-char words drop") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    // "abc" ×3 + "ab" ×1 → (a,b): 4, (b,c): 3; "x" contributes nothing
    Seq((1L, "abc ab x"), (2L, "abc abc"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.bpePairCounts(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "b", 4L), ("b", "c", 3L)))
  }

  test("collocations: lift ranks the glued pair above independents; min-count gates") {
    val dir = java.nio.file.Files.createTempDirectory("coll").toString
    // "x y" always glued (5 docs) → lift = 5·N/(5·5); fillers vary.
    // A pair seen < 5 times must not appear.
    val texts = Seq("x y a", "x y b", "x y c", "x y d", "x y e a b")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.collocations(spark, dir, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.length == 1) // only (x, y) reaches 5 occurrences
    val (a, b, cab, ca, cb, lift) = got(0)
    assert((a, b, cab, ca, cb) === (("x", "y", 5L, 5L, 5L)))
    val n = 17.0 // total tokens
    assert(lift === 5.0 * n / (5.0 * 5.0))
  }

  test("langDiversity: uniform tokens max out Simpson; constant tokens zero it") {
    val dir = java.nio.file.Files.createTempDirectory("div").toString
    // en: 4 distinct tokens once each → 1 - 4/16 = 0.75
    // fr: one token repeated 3×     → 1 - 9/9  = 0.0
    Seq((1L, "a b c d", "en"), (2L, "x x x", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.langDiversity(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("en") === ((4L, 4L, 0.75)))
    assert(got("fr") === ((3L, 1L, 0.0)))
  }

  test("vocabRichness: frequency spectrum and estimators on a hand corpus") {
    val dir = java.nio.file.Files.createTempDirectory("rich").toString
    // doc1 trigrams: "a b c", "b c a", "c a b" (each once)
    // doc2 trigrams: "a b c" (again) -> counts: {"a b c": 2, others: 1}
    Seq((1L, "a b c a b"), (2L, "a b c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.LlmOps.vocabRichness(spark, dir).collect()(0)
    assert(r.getLong(0) == 4L, s"instances: $r")      // 3 + 1 grams
    assert(r.getLong(1) == 3L, s"types: $r")
    assert(r.getLong(2) == 2L, s"hapax: $r")          // "b c a", "c a b"
    assert(r.getLong(3) == 1L, s"dis: $r")            // "a b c"
    assert(r.getDouble(4) == 0.5, s"gt_p0 = 2/4: $r")
    // bias-corrected chao1 = 3 + 2*1/(2*(1+1)) = 3.5
    assert(r.getDouble(5) == 3.5, s"chao1: $r")
  }

  test("sourceNovelty: cross-source duplicate grams zero out, unique content reads 1") {
    val dir = java.nio.file.Files.createTempDirectory("nov").toString
    // srcA doc 1 and srcB doc 2 share their single 8-gram (df=2 →
    // novelty 0); srcC doc 3's 8-gram is unique (novelty 1)
    Seq((1L, "a b c d e f g h", "srcA"),
        (2L, "a b c d e f g h", "srcB"),
        (3L, "p q r s t u v w", "srcC"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.sourceNovelty(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("srcA") == ((1L, 1L, 0L, 0.0)), s"$got")
    assert(got("srcB") == ((1L, 1L, 0L, 0.0)), s"$got")
    assert(got("srcC") == ((1L, 1L, 1L, 1.0)), s"$got")
  }

  test("vocabOverlap: jaccard from distinct-token sets, ordered pairs only") {
    val dir = java.nio.file.Files.createTempDirectory("ovl").toString
    // en vocab {a,b,c}, fr vocab {b,c,d}: inter 2, union 4 → 0.5
    Seq((1L, "a b c b", "en"), (2L, "b c d", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmOps.vocabOverlap(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "en" && r.getString(1) == "fr")
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 0.5)
  }
}
