package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (with `doGenCode`) for the per-document
  * hashing kernels. The equivalent built-in formulations need
  * higher-order functions (`transform`/`aggregate`), which Catalyst
  * always evaluates interpreted and which re-evaluate shared subtrees —
  * at 100 TB (and measurably at sf0.1) that is the dominant cost of the
  * dedup family. These generate a single static call inside whole-stage
  * codegen instead.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** hash60 of each distinct word n-gram shingle — the fused
  * explode-free form of `WordShingles` + md5/substring/conv: same
  * values (GraftStrings.hash60 is the oracle-shared definition), one
  * kernel call per document, long array out. See
  * GraftStrings.wordShingleHashes for why the fusion matters.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.wordShingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.wordShingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** hash60 of the n-token gram at EVERY token position (duplicates
  * kept, in position order) — the fused form of
  * posexplode(tokenChunks(text, n, 1)) restricted to full windows then
  * hashed; the span-detection family's positional stream.
  */
case class TokenGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.tokenGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.tokenGramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenGramHashes =
    copy(child = newChild)
}

/** Consecutive token-hash pairs (h1, h2) in position order, duplicates
  * kept (see GraftStrings.tokenPairHashes): the bigram stream with its
  * component hashes for history/continuation-keyed aggregation — one
  * codegen'd kernel pass replacing the interpreted
  * transform(sequence(...), i -> struct(g[i], g[i+1])) zip.
  */
case class TokenPairHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_pair_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.tokenPairHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.tokenPairHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenPairHashes =
    copy(child = newChild)
}

/** WordPiece greedy longest-match piece count for one word under a
  * plan-time vocabulary (see GraftStrings.wordpiecePieces for the
  * segmentation contract). NULL when some position is uncoverable —
  * callers guarantee coverage by including all single characters in
  * both vocab halves. Map-only and codegen'd: the vocabulary rides the
  * plan as a reference object, so encoding a corpus is one scan with
  * zero joins (a vocab broadcast join would cap the vocabulary at
  * broadcast size for no exchange saving — the Bpe.encodeStats
  * argument, one operator over).
  */
case class WordpiecePieces(child: Expression, plain: Seq[String],
    cont: Seq[String]) extends UnaryExpression {
  require(plain.nonEmpty && cont.nonEmpty,
    "wordpiece_pieces needs a non-empty vocabulary in both halves")

  // Seq in the case class for canonicalization (array equality is by
  // reference); the kernel gets cached byte[][] of UTF-8 piece bytes
  private lazy val plainBytes: Array[Array[Byte]] =
    plain.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private lazy val contBytes: Array[Array[Byte]] =
    cont.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_pieces"

  override protected def nullSafeEval(input: Any): Any = {
    val n = GraftStrings.wordpiecePieces(
      input.asInstanceOf[UTF8String], plainBytes, contBytes)
    if (n < 0) null else n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("wordpiecePlain", plainBytes, "byte[][]")
    val cRef = ctx.addReferenceObj("wordpieceCont", contBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftStrings.wordpiecePieces($c, $pRef, $cRef);
         |if (${ev.value} < 0) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WordpiecePieces =
    copy(child = newChild)
}

/** MINIMUM-TOKEN segmentation piece count under a plan-time vocabulary
  * (see GraftStrings.minPieces for the DP contract) — the
  * shortest-path objective of PathPiece (Schmidt et al., EMNLP 2024),
  * the DP-optimal counterpart of [[WordpiecePieces]]'s greedy walk
  * over the SAME vocabulary: always ≤ the greedy count, NULL on an
  * uncoverable word. Map-only and codegen'd like the greedy kernel —
  * the vocabulary rides the plan as a reference object, so the
  * optimal-vs-greedy bake-off is one scan with zero joins.
  */
case class MinPieces(child: Expression, plain: Seq[String],
    cont: Seq[String]) extends UnaryExpression {
  require(plain.nonEmpty && cont.nonEmpty,
    "min_pieces needs a non-empty vocabulary in both halves")

  private lazy val plainBytes: Array[Array[Byte]] =
    plain.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private lazy val contBytes: Array[Array[Byte]] =
    cont.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "min_pieces"

  override protected def nullSafeEval(input: Any): Any = {
    val n = GraftStrings.minPieces(
      input.asInstanceOf[UTF8String], plainBytes, contBytes)
    if (n < 0) null else n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("minPiecesPlain", plainBytes, "byte[][]")
    val cRef = ctx.addReferenceObj("minPiecesCont", contBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftStrings.minPieces($c, $pRef, $cRef);
         |if (${ev.value} < 0) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinPieces =
    copy(child = newChild)
}

/** WordPiece greedy segmentation emitting vocabulary IDS (see
  * GraftStrings.wordpieceIds): the encode-to-model-input sibling of
  * [[WordpiecePieces]] — same longest-match walk, but each consumed
  * piece contributes its id. `pieces` pairs each (cont, sub) with its
  * id; split into the two kernel halves here, once, at plan time.
  */
case class WordpieceIds(child: Expression,
    pieces: Seq[(Boolean, String, Int)]) extends UnaryExpression {
  require(pieces.nonEmpty, "wordpiece_ids needs a non-empty vocabulary")

  private lazy val (plainB, plainI) = {
    val p = pieces.filter(!_._1)
    (p.map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray,
      p.map(_._3).toArray)
  }
  private lazy val (contB, contI) = {
    val c = pieces.filter(_._1)
    (c.map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray,
      c.map(_._3).toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_ids"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.wordpieceIds(input.asInstanceOf[UTF8String],
      plainB, plainI, contB, contI)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pb = ctx.addReferenceObj("wpIdsPlain", plainB, "byte[][]")
    val pi = ctx.addReferenceObj("wpIdsPlainIds", plainI, "int[]")
    val cb = ctx.addReferenceObj("wpIdsCont", contB, "byte[][]")
    val ci = ctx.addReferenceObj("wpIdsContIds", contI, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftStrings.wordpieceIds($c, $pb, $pi, $cb, $ci);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceIds =
    copy(child = newChild)
}

/** Per-term token frequencies + total token count in one codegen'd
  * kernel pass (see GraftStrings.termFreqs for the token-boundary
  * contract): output[i] = tf of terms(i), output(terms.length) = doc
  * token count. The whole per-document sufficient statistic for BM25
  * scoring against a fixed term set — replaces an explode+isin+groupBy
  * tf build (corpus-sized generator + posting shuffle) and a separate
  * tokenCount pass with one map-only expression.
  */
case class TermFreqs(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term_freqs needs at least one term")
  require(terms.distinct == terms, "term_freqs terms must be distinct")

  // Seq in the case class for canonicalization (array equality is by
  // reference); the kernel gets one cached byte[][] of UTF-8 term bytes
  private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "term_freqs"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.termFreqs(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("termFreqTerms", termBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.termFreqs($c, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
}

/** Per-document (term, tf) entries — the distinct whitespace tokens of
  * the trimmed input with their occurrence counts, one kernel pass.
  * The fused form of `explode(tokens) + groupBy(doc, term).count()`:
  * that formulation shuffles the whole token stream to build per-doc
  * tfs that are per-ROW facts; this emits them map-side, so the tf
  * relation exists with ZERO exchanges (see GraftStrings.termTfEntries
  * for the exact tokenization contract shared with the oracle).
  */
case class TermTfEntries(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "term_tf_entries"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.termTfEntries(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.termTfEntries($c);")

  override protected def withNewChildInternal(newChild: Expression): TermTfEntries =
    copy(child = newChild)
}

/** Winnowing fingerprints (the MOSS selection): distinct w-window
  * minima of the positional n-gram hash stream, right-edge partial
  * windows kept — one primitive kernel pass replacing the interpreted
  * transform/slice/array_min/array_distinct HOF chain (see
  * GraftStrings.winnowHashes for the equivalence contract).
  */
case class WinnowHashes(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram size must be >= 1, got $n")
  require(w >= 1, s"window size must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.winnowHashes(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.winnowHashes($c, $n, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

/** Overlapping token-window chunks — the RAG / context-window prep op.
  * One kernel call per document inside whole-stage codegen; the
  * equivalent sequence/transform/slice HOF chain evaluates interpreted
  * and re-tokenizes per window.
  */
case class TokenChunks(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window >= 1 && stride >= 1,
    s"need window,stride >= 1, got window=$window stride=$stride")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_chunks"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.tokenChunks(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.tokenChunks($c, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)
}

/** MinHash signature (k permuted min-hashes over distinct word n-gram
  * shingles) computed MAP-ONLY in one kernel pass — replaces the
  * explode-shingles → shuffle → 16-min-aggregations formulation: no
  * exchange at all, signature cost is one scan. Same permutation
  * constants as Dedup.minhashParams / the DuckDB oracle. NULL for
  * documents with no shingles (the explode formulation emits no row for
  * them — callers filter nulls to match).
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1, s"need n,k >= 1, got n=$n k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set => null
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.minHashSigArray(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftStrings.minHashSigArray($c, $n, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Gopher-style repetition quality signals as ONE map-only kernel call:
  * struct(top_frac, dup_frac, dup_large_frac) — most-frequent
  * nSmall-gram fraction, duplicate nSmall-gram fraction, duplicate
  * nLarge-gram fraction. The explode-grams → two groupBys formulation
  * shuffles every gram of the corpus twice; this computes the same
  * doubles (identical division order) in the scan's codegen span, so
  * the corpus-wide quality pass stays exchange-free at any scale.
  * Struct fields are null when the doc has no gram of that size.
  */
case class RepetitionStats(child: Expression, nSmall: Int, nLarge: Int)
    extends UnaryExpression {
  require(nSmall >= 1 && nLarge >= nSmall,
    s"need 1 <= nSmall <= nLarge, got nSmall=$nSmall nLarge=$nLarge")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = true),
    StructField("dup_frac", DoubleType, nullable = true),
    StructField("dup_large_frac", DoubleType, nullable = true)))
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.repetitionStats(input.asInstanceOf[UTF8String], nSmall, nLarge)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.repetitionStats($c, $nSmall, $nLarge);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Cosine similarity over two numeric array columns (float or double
  * elements), as one codegen'd kernel call. Replaces the
  * zip_with+aggregate HOF chain, which Catalyst evaluates interpreted —
  * same IEEE operation order, so results are bit-identical on
  * equal-length arrays with non-null elements (the embedding-column
  * contract).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVectors.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftVectors.cosine($a, $b, " +
        s"${elemIsFloat(left)}, ${elemIsFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two numeric array columns — same kernel family as
  * CosineSim (left-fold order, cast-to-double widening).
  */
case class DotProd(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_prod"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVectors.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftVectors.dot($a, $b, " +
        s"${elemIsFloat(left)}, ${elemIsFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

/** 60-bit SimHash signature of whitespace-tokenized text; md5-derived
  * per-token hashes, so any engine (incl. the DuckDB oracle) reproduces
  * it. See GraftStrings.simHash60 for the exact bit semantics.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.simHash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftStrings.simHash60($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Int8 scalar quantization of a float/double embedding: the 4× storage
  * and shuffle-width reduction for vector search at 100 TB. Codes are
  * engine-portable by construction (floor(x·scale + 0.5), scale =
  * 127/max|x| — see GraftVectors.quantizeI8), so the DuckDB oracle
  * reproduces them bit-for-bit and int8 dot products compare exactly.
  */
case class QuantizeI8(child: Expression)
    extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got $other")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "quantize_i8"

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      GraftVectors.quantizeI8(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        elemIsFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.GraftVectors.quantizeI8($c, $elemIsFloat));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

/** The scale factor QuantizeI8 applied (127/max|x|; 0 for an all-zero
  * vector) — needed to turn int8 dot products back into approximate
  * real-valued scores: dot(a,b) ≈ dot_i8(qa,qb)/(scale_a·scale_b).
  */
case class QuantizeScale(child: Expression)
    extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantize_scale"

  override protected def nullSafeEval(input: Any): Any =
    GraftVectors.quantizeScale(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftVectors.quantizeScale($c, $elemIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeScale =
    copy(child = newChild)
}

/** Exact integer dot product of two int8 code arrays — the hot loop of
  * quantized vector search, one codegen'd kernel call per row.
  */
case class DotI8(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVectors.dotI8(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftVectors.dotI8($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode of an int8 code vector against a
  * codebook that ships with the plan (m·k·d longs — parameter-sized,
  * broadcast by definition). Emits the m subspace codeword ids as
  * array<int>. A naive column formulation of the argmin is m·k·d
  * expression nodes (8·16·8 = 1024 here) — enough to blow the generated
  * `processNext()` past janino's method limits and knock the whole
  * stage back to interpreted eval; this kernel call keeps the loop in
  * ONE static JIT-compiled method and the generated code one line. The
  * codebook rides `ctx.addReferenceObj`, not a literal, so codegen
  * never renders 1024 long constants either.
  */
case class PqEncode(child: Expression, cb: Seq[Long], m: Int, k: Int)
    extends UnaryExpression {

  // Seq, not Array: case-class equality on an Array is by reference,
  // which would make two structurally identical PqEncode nodes never
  // compare equal — defeating expression canonicalization and
  // subexpression elimination. The kernel gets one cached primitive
  // array, never a per-row conversion.
  private lazy val cbArr: Array[Long] = cb.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) =>
      if (cb.length == 0 || cb.length % (m * k) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName codebook length ${cb.length} not divisible by m*k=${m * k}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<tinyint> argument, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // a row whose length does not match the codebook's m*d layout encodes
  // to null, not to out-of-bounds codebook reads
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = GraftVectors.pqEncode(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cbArr, m, k)
    if (codes == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "long[]")
    val codes = ctx.freshName("pqCodes")
    nullSafeCodeGen(ctx, ev, c =>
      s"""int[] $codes = graft.functions.GraftVectors.pqEncode($c, $cbRef, $m, $k);
         |if ($codes == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Image-header dimension decode over a binary payload column:
  * `[formatCode, width, height]` (1=png 2=jpeg 3=gif) parsed from the
  * REAL header bytes by the GraftMedia kernel — one static call inside
  * whole-stage codegen, NULL for payloads that are not a recognized
  * image (opaque/corrupt media must not fail the task at scale).
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // unrecognized payload => null
  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(input: Any): Any =
    GraftMedia.dimsArray(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftMedia.dimsArray($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

/** Unigram-LM (SentencePiece) Viterbi DP key for one word under a
  * plan-time vocabulary with integer costs (see
  * GraftStrings.unigramDpKey for the key encoding: cost·1024 + piece
  * count). The flat vocabulary and its fixed-point costs ride the plan
  * as reference objects — encoding a corpus is one scan with zero
  * joins, the [[WordpiecePieces]] argument one model over. NULL on an
  * uncoverable word (callers include every domain single character).
  */
case class UnigramDpKey(child: Expression, pieces: Seq[String],
    costs1024: Seq[Long]) extends UnaryExpression {
  require(pieces.nonEmpty && pieces.length == costs1024.length,
    "unigram_dp_key needs a non-empty vocabulary with aligned costs")

  private lazy val pieceBytes: Array[Array[Byte]] =
    pieces.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private lazy val costArr: Array[Long] = costs1024.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_dp_key"

  override protected def nullSafeEval(input: Any): Any = {
    val k = GraftStrings.unigramDpKey(
      input.asInstanceOf[UTF8String], pieceBytes, costArr)
    if (k < 0) null else k
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("unigramPieces", pieceBytes, "byte[][]")
    val cRef = ctx.addReferenceObj("unigramCosts", costArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftStrings.unigramDpKey($c, $pRef, $cRef);
         |if (${ev.value} < 0) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramDpKey =
    copy(child = newChild)
}

/** Unigram-LM Viterbi segmentation emitting piece INDEXES into the
  * plan-time vocabulary — the E-step kernel of the unigram fit (usage
  * counts come from exploding the indexes) and the ids face. Tie-break
  * (least key, then longest piece) matches the DuckDB oracle's combo
  * argmin. NULL on an uncoverable word.
  */
case class UnigramSegPieces(child: Expression, pieces: Seq[String],
    costs1024: Seq[Long]) extends UnaryExpression {
  require(pieces.nonEmpty && pieces.length == costs1024.length,
    "unigram_seg_pieces needs a non-empty vocabulary with aligned costs")

  private lazy val pieceBytes: Array[Array[Byte]] =
    pieces.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  private lazy val costArr: Array[Long] = costs1024.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_seg_pieces"

  override protected def nullSafeEval(input: Any): Any =
    GraftStrings.unigramSegPieces(
      input.asInstanceOf[UTF8String], pieceBytes, costArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("unigramSegPieces", pieceBytes, "byte[][]")
    val cRef = ctx.addReferenceObj("unigramSegCosts", costArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GraftStrings.unigramSegPieces($c, $pRef, $cRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegPieces =
    copy(child = newChild)
}

/** Aho-Corasick multi-pattern occurrence counter (the blocklist/PII
  * scan kernel): one byte pass over the text counts EVERY occurrence
  * of every plan-time pattern — overlapping and nested matches
  * included (a hit on "scan" also hits "can" and "an" at the same end
  * position via the dictionary suffix chain). The automaton is built
  * once per plan and rides it as a reference object
  * ([[graft.functions.AhoAutomaton]]); output is one count per
  * pattern, input order. O(text + matches) per row vs |patterns|
  * contains/regex passes.
  */
case class AcCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "ac_counts needs at least one pattern")

  private lazy val automaton = new AhoAutomaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_counts"

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      automaton.countAll(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AhoAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($aRef.countAll($c.getBytes()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AcCounts =
    copy(child = newChild)
}

/** Aho-Corasick REDACTION: every byte covered by any occurrence of any
  * plan-time pattern (union of matched spans) replaced with '#', one
  * byte pass per row — the blocklist/PII masking action beside
  * [[AcCounts]]' census.
  */
case class AcMask(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "ac_mask needs at least one pattern")

  private lazy val automaton = new AhoAutomaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "ac_mask"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromBytes(automaton.maskAll(
      input.asInstanceOf[UTF8String].getBytes, '#'.toByte))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("acMaskAutomaton", automaton,
      "graft.functions.AhoAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |  .fromBytes($aRef.maskAll($c.getBytes(), (byte) '#'));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AcMask =
    copy(child = newChild)
}

/** Covered-byte count of [[AcMask]]'s span union, computed from the
  * automaton's own frontier walk rather than by counting mask
  * characters in the output — redaction accounting stays exact on
  * texts that already contain the mask character.
  */
case class AcMaskedCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "ac_masked_count needs at least one pattern")

  private lazy val automaton = new AhoAutomaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "ac_masked_count"

  override protected def nullSafeEval(input: Any): Any =
    automaton.maskedCount(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("acMcAutomaton", automaton,
      "graft.functions.AhoAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $aRef.maskedCount($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMaskedCount =
    copy(child = newChild)
}
