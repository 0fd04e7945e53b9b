package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ChunkRows, CosineSim, DotI8, DotProd, QuantizeI8, QuantizeScale, RepetitionStats, SimHash60, TokenChunks, TokenGramHashes, TokenPairHashes, WinnowHashes, WordShingleHashes, WordShingles}

/** SparkSessionExtensions hook (SURVEY.md §4.3.4): registers the graft
  * custom expressions as SQL functions so `spark.sql` users get them too
  * — `word_shingles(text, n)`, `simhash60(text)`, `cosine_sim(a, b)`,
  * `dot_prod(a, b)` — and the planner strategy for the native as-of
  * join ([[graft.plans.AsofJoinStrategy]]).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done in
  * this repo's session builders) or `.withExtensions(new
  * GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite())
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(n: Int, IntegerType)) => WordShingles(text, n)
        case _ => throw new IllegalArgumentException(
          "word_shingles(text, n) requires a literal int n")
      }))
    ext.injectFunction((FunctionIdentifier("token_chunks"),
      info("token_chunks", "token_chunks(text, window, stride) - overlapping token-window chunks"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(w: Int, IntegerType), Literal(s: Int, IntegerType)) =>
          TokenChunks(text, w, s)
        case _ => throw new IllegalArgumentException(
          "token_chunks(text, window, stride) requires literal int window/stride")
      }))
    ext.injectFunction((FunctionIdentifier("chunk_rows"),
      info("chunk_rows", "chunk_rows(text, window, stride) - streaming (chunk_idx, chunk) rows; use with LATERAL VIEW"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(w: Int, IntegerType), Literal(s: Int, IntegerType)) =>
          ChunkRows(text, w, s)
        case _ => throw new IllegalArgumentException(
          "chunk_rows(text, window, stride) requires literal int window/stride")
      }))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text, nSmall, nLarge) - struct(top_frac, dup_frac, dup_large_frac) word-n-gram repetition signals"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(s: Int, IntegerType), Literal(l: Int, IntegerType)) =>
          RepetitionStats(text, s, l)
        case _ => throw new IllegalArgumentException(
          "repetition_stats(text, nSmall, nLarge) requires literal int sizes")
      }))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit md5-derived SimHash"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of numeric arrays"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("dot_prod"),
      info("dot_prod", "dot_prod(a, b) - dot product of numeric arrays"),
      (exprs: Seq[Expression]) => DotProd(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("quantize_i8"),
      info("quantize_i8", "quantize_i8(v) - int8 scalar-quantization codes"),
      (exprs: Seq[Expression]) => QuantizeI8(exprs.head)))
    ext.injectFunction((FunctionIdentifier("quantize_scale"),
      info("quantize_scale", "quantize_scale(v) - the 127/max|x| factor quantize_i8 used"),
      (exprs: Seq[Expression]) => QuantizeScale(exprs.head)))
    ext.injectFunction((FunctionIdentifier("dot_i8"),
      info("dot_i8", "dot_i8(a, b) - exact integer dot product of int8 code arrays"),
      (exprs: Seq[Expression]) => DotI8(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("word_shingle_hashes"),
      info("word_shingle_hashes",
        "word_shingle_hashes(text, n) - hash60 of each distinct word n-gram, first-occurrence order"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(n: Int, IntegerType)) => WordShingleHashes(text, n)
        case _ => throw new IllegalArgumentException(
          "word_shingle_hashes(text, n) requires a literal int n")
      }))
    ext.injectFunction((FunctionIdentifier("token_gram_hashes"),
      info("token_gram_hashes",
        "token_gram_hashes(text, n) - hash60 of the n-gram at every position, duplicates kept"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(n: Int, IntegerType)) => TokenGramHashes(text, n)
        case _ => throw new IllegalArgumentException(
          "token_gram_hashes(text, n) requires a literal int n")
      }))
    ext.injectFunction((FunctionIdentifier("token_pair_hashes"),
      info("token_pair_hashes",
        "token_pair_hashes(text) - consecutive token-hash (h1, h2) structs, position order, duplicates kept"),
      (exprs: Seq[Expression]) => TokenPairHashes(exprs.head)))
    ext.injectFunction((FunctionIdentifier("winnow_hashes"),
      info("winnow_hashes",
        "winnow_hashes(text, n, w) - distinct w-window minima of the positional n-gram hash stream (MOSS winnowing fingerprints)"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(n: Int, IntegerType), Literal(w: Int, IntegerType)) =>
          WinnowHashes(text, n, w)
        case _ => throw new IllegalArgumentException(
          "winnow_hashes(text, n, w) requires literal int n/w")
      }))
  }
}
