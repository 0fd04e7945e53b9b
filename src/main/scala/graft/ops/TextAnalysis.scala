package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, and
  * document fingerprinting. All pure Catalyst built-ins — per-row,
  * narrow, whole-stage-codegen'd, no shuffle, so they scale linearly
  * with input splits (the 100 TB shape: map-only over parquet).
  */
object TextAnalysis {

  /** Whitespace tokens of the trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-ish count: word runs + isolated punctuation, the
    * usual cheap proxy for tokenizer load (ASCII \w semantics match RE2
    * so the DuckDB oracle agrees).
    */
  def bpeishCount(c: Column): Column = regexp_count(c, lit("\\w+|[^\\w\\s]"))

  // ------------------------------------------------------- PII scrubbing

  /** Email-shaped spans (pattern valid in both Java regex and RE2, so
    * the DuckDB oracle matches byte-for-byte).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit runs — the id/phone/account-number shape. */
  val idPattern = "[0-9]+"

  /** Redact every match of `pattern` (PII masking is map-only: a
    * codegen'd regexp_replace in the scan projection; at 100 TB it
    * pipelines with the read, no shuffle).
    */
  def mask(c: Column, pattern: String, replacement: String = "#"): Column =
    regexp_replace(c, pattern, replacement)

  /** Count of `pattern` matches — the detection/reporting face. */
  def patternCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  /** Small per-language marker lexicons for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny and fixed — the operator
    * shape (per-row scoring + argmax) is what matters; swap lexicons for
    * production.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "y", "las", "es"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Language-ID: marker-hit counts per language, argmax with a fixed
    * priority-order tiebreak (first language in `langMarkers` wins ties)
    * so the result is deterministic.
    */
  def langScores(c: Column): Seq[(String, Column)] = {
    val toks = tokens(c)
    langMarkers.map { case (lang, ms) => lang -> markerCount(toks, ms) }
  }

  def langId(c: Column): Column = {
    val scores = langScores(c)
    scores.foldRight(lit(scores.last._1)) { case ((lang, s), elseCol) =>
      val others = scores.filter(_._1 != lang).map(_._2)
      when(s >= greatest(others: _*), lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality signals: char length, token count, mean token length,
    * stopword ratio, punctuation ratio, alpha ratio. Ratios are exact-int
    * divisions → bit-identical across engines.
    */
  def withQualitySignals(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast(DoubleType)
    df.withColumn("n_chars", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_bpeish", bpeishCount(text))
      .withColumn("mean_token_len",
        (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / nTok))
      .withColumn("stopword_ratio",
        markerCount(toks, langMarkers.head._2).cast(DoubleType) / nTok)
      .withColumn("punct_ratio",
        regexp_count(text, lit("[^\\w\\s]")).cast(DoubleType) /
          length(text).cast(DoubleType))
      .withColumn("alpha_ratio",
        regexp_count(text, lit("[A-Za-z]")).cast(DoubleType) /
          length(text).cast(DoubleType))
  }

  /** Bag fingerprint: md5 of the sorted distinct token set — an
    * order-insensitive document signature (two docs with permuted words
    * collide, which is the point for near-dup blocking).
    */
  def bagFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** Rolling polynomial fingerprint over tokens (order-SENSITIVE cousin
    * of bagFingerprint): h = h*31 + tokenHash (mod 2^31-1). Token hash is
    * md5-derived so it is engine-portable; the modulus keeps every
    * intermediate below 2^37 — no int64 overflow in any engine.
    */
  def rollingFingerprint(c: Column): Column = {
    val p = lit(2147483647L) // 2^31 - 1
    aggregate(tokens(c), lit(7L),
      (acc, t) => pmod(acc * 31 + pmod(conv(substring(md5(t), 1, 15), 16, 10).cast(LongType), p), p))
  }

  // ----------------------------------------------------- Gopher rules

  /** Gopher-style document-quality rule verdicts (Rae et al. 2021 §A1.1
    * shape): word-count bounds, mean-word-length bounds, alphabetic-word
    * fraction, symbol-to-word ratio, minimum distinct stopwords. Every
    * comparison is integer-exact (ratios are cross-multiplied, never
    * divided) so the verdict is bit-identical across engines — no float
    * epsilon at the keep/drop boundary. Map-only over the scan: at
    * 100 TB this pipelines with the read, no exchange.
    *
    * Thresholds are parameters; the defaults are tuned to discriminate
    * on the synthetic corpus (so the oracle actually exercises both
    * branches of every rule) while keeping the production shape.
    */
  def gopherVerdicts(
      df: DataFrame,
      text: Column,
      minTokens: Int = 20,
      maxTokens: Int = 90,
      // mean word length bounds as exact rationals: lo = 7/2, hi = 5/1
      mwlLoNum: Int = 7, mwlLoDen: Int = 2,
      mwlHiNum: Int = 5, mwlHiDen: Int = 1,
      // alpha-word fraction >= 4/5; symbol-to-word ratio <= 1/10
      alphaNum: Int = 4, alphaDen: Int = 5,
      symNum: Int = 1, symDen: Int = 10,
      minStopwords: Int = 2): DataFrame = {
    val toks = tokens(text)
    val n = size(toks).cast(LongType)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast(LongType)
    val nSym = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\."))).cast(LongType)
    val nStop = size(filter(array_distinct(toks),
      t => t.isin(langMarkers.head._2.map(lit): _*)))
    df.withColumn("n_tokens", size(toks))
      .withColumn("rule_word_count", n >= minTokens && n <= maxTokens)
      .withColumn("rule_mean_word_len",
        sumLen * mwlLoDen >= n * mwlLoNum && sumLen * mwlHiDen <= n * mwlHiNum)
      .withColumn("rule_alpha_words", nAlpha * alphaDen >= n * alphaNum)
      .withColumn("rule_symbol_ratio", nSym * symDen <= n * symNum)
      .withColumn("rule_stopwords", nStop >= minStopwords)
      .withColumn("keep",
        col("rule_word_count") && col("rule_mean_word_len") &&
          col("rule_alpha_words") && col("rule_symbol_ratio") &&
          col("rule_stopwords"))
  }

  /** The full per-document analysis over the documents table. */
  def analyzeDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    withQualitySignals(docs.select(col("doc_id"), col("text")), col("text"))
      .withColumn("lang_pred", langId(col("text")))
      .withColumn("fingerprint", bagFingerprint(col("text")))
      .drop("text")
  }
}
