package graft.functions

import org.apache.spark.sql.Column

/** Column-level API over the graft custom expressions. */
object GraftFunctions {

  /** Distinct word n-gram shingles (first-occurrence order) — codegen'd
    * replacement for the transform/slice/array_distinct HOF chain.
    */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** hash60 of each distinct word n-gram shingle, one fused kernel call
    * — replaces explode(wordShingles) + md5/substring/conv with a long
    * array (same hash values, no per-shingle string rows).
    */
  def wordShingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(text), n))

  /** hash60 of the n-token gram at every position (duplicates kept, in
    * position order) — the positional sibling of wordShingleHashes for
    * the span-detection family.
    */
  def tokenGramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(TokenGramHashes(ColumnBridge.expression(text), n))

  /** Per-term token frequencies + total token count in one kernel pass:
    * result(i) = tf of terms(i), result(terms.length) = token count —
    * the per-document sufficient statistic for BM25-family scoring.
    */
  def termFreqs(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermFreqs(ColumnBridge.expression(text), terms))

  /** Consecutive token-hash pairs (h1, h2), position order, duplicates
    * kept — the component-keyed bigram stream for Kneser-Ney-style
    * history/continuation statistics.
    */
  def tokenPairHashes(text: Column): Column =
    ColumnBridge.column(TokenPairHashes(ColumnBridge.expression(text)))

  /** Per-document (term, tf) entries (distinct tokens with counts) in
    * one kernel pass — the zero-exchange tf relation (the
    * explode+groupBy formulation shuffles the whole token stream for
    * per-row facts).
    */
  def termTfEntries(text: Column): Column =
    ColumnBridge.column(TermTfEntries(ColumnBridge.expression(text)))

  /** WordPiece greedy longest-match piece count under a plan-time
    * vocabulary (plain = word-start pieces, cont = "##" continuation
    * pieces WITHOUT the marker); NULL on an uncoverable word.
    */
  def wordpiecePieces(word: Column, plain: Seq[String],
      cont: Seq[String]): Column =
    ColumnBridge.column(WordpiecePieces(
      ColumnBridge.expression(word), plain, cont))

  /** Minimum-token (shortest-path DP) piece count under the same
    * two-half plan-time vocabulary as [[wordpiecePieces]] — always ≤
    * the greedy count; NULL on an uncoverable word.
    */
  def minPieces(word: Column, plain: Seq[String],
      cont: Seq[String]): Column =
    ColumnBridge.column(MinPieces(ColumnBridge.expression(word), plain, cont))

  /** WordPiece greedy segmentation emitting vocabulary ids; `pieces`
    * rows are (isContinuation, content-without-##, id). NULL on an
    * uncoverable word.
    */
  def wordpieceIds(word: Column, pieces: Seq[(Boolean, String, Int)]): Column =
    ColumnBridge.column(WordpieceIds(ColumnBridge.expression(word), pieces))

  /** Winnowing fingerprints: distinct w-window minima of the positional
    * n-gram hash stream (MOSS selection), one codegen'd kernel pass.
    */
  def winnowHashes(text: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowHashes(ColumnBridge.expression(text), n, w))

  /** Unigram-LM Viterbi DP key (cost·1024 + piece count) under a
    * plan-time flat vocabulary with pre-scaled fixed-point costs;
    * NULL on an uncoverable word.
    */
  def unigramDpKey(word: Column, pieces: Seq[String],
      costs1024: Seq[Long]): Column =
    ColumnBridge.column(UnigramDpKey(
      ColumnBridge.expression(word), pieces, costs1024))

  /** Unigram-LM Viterbi segmentation as piece indexes into the
    * plan-time vocabulary; NULL on an uncoverable word.
    */
  def unigramSegPieces(word: Column, pieces: Seq[String],
      costs1024: Seq[Long]): Column =
    ColumnBridge.column(UnigramSegPieces(
      ColumnBridge.expression(word), pieces, costs1024))

  /** Aho-Corasick occurrence counts of every plan-time pattern in one
    * byte pass (overlapping/nested matches included) — the blocklist
    * scan kernel. One long count per pattern, input order.
    */
  def acCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcCounts(ColumnBridge.expression(text), patterns))

  /** Aho-Corasick redaction: every byte covered by any pattern
    * occurrence replaced with '#', one pass per row.
    */
  def acMask(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcMask(ColumnBridge.expression(text), patterns))

  /** Covered-byte count of acMask's span union, derived from the
    * automaton directly (never from counting '#' in the masked output).
    */
  def acMaskedCount(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcMaskedCount(ColumnBridge.expression(text), patterns))

  /** 60-bit md5-derived SimHash signature — codegen'd replacement for the
    * aggregate/transform vote loop.
    */
  def simhash60(text: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(text)))

  /** Overlapping token-window chunks: window tokens every stride tokens,
    * final windows truncated at the document end.
    */
  def tokenChunks(text: Column, window: Int, stride: Int): Column =
    ColumnBridge.column(TokenChunks(ColumnBridge.expression(text), window, stride))

  /** Repetition quality signals struct(top_frac, dup_frac,
    * dup_large_frac) over word n-grams, one map-only kernel call.
    */
  def repetitionStats(text: Column, nSmall: Int, nLarge: Int): Column =
    ColumnBridge.column(
      RepetitionStats(ColumnBridge.expression(text), nSmall, nLarge))

  /** Streaming chunk generator (UDTF): emits one (chunk_idx, chunk) row
    * per token window, O(tokens) memory per document vs the array
    * formulation's O(tokens·window/stride). Use in `select` beside other
    * columns; name the output with `.as(Seq("chunk_idx", "chunk"))`.
    */
  def chunkRows(text: Column, window: Int, stride: Int): Column =
    ColumnBridge.column(ChunkRows(ColumnBridge.expression(text), window, stride))

  /** Generator: all unordered (doc_a < doc_b) pairs from an array<bigint>
    * column in O(|array|) memory — the pair-enumeration kernel of the
    * inverted-index dedup family. Name the output with
    * `.as(Seq("doc_a", "doc_b"))`.
    */
  def longPairs(ids: Column): Column =
    ColumnBridge.column(LongPairs(ColumnBridge.expression(ids)))

  /** Generator: hamming-verified simhash pairs from one LSH bucket's
    * collected (id, sig) entries — see [[HammingSigPairs]].
    */
  def hammingSigPairs(entries: Column, maxDist: Int): Column =
    ColumnBridge.column(
      HammingSigPairs(ColumnBridge.expression(entries), maxDist))

  /** Generator: all unordered pairs with each endpoint's carried weight
    * — `(doc_a, w_a, doc_b, w_b)` from the ids/ws halves of a
    * [[BoundedPostings]] result. Name the output with
    * `.as(Seq("doc_a", "w_a", "doc_b", "w_b"))`.
    */
  def longPairsWeighted(ids: Column, ws: Column): Column =
    ColumnBridge.column(LongPairsWeighted(
      ColumnBridge.expression(ids), ColumnBridge.expression(ws)))

  /** Aggregate: exact doc-frequency + posting list capped at cap+1
    * (id, weight) entries — the bounded-memory replacement for
    * `collect_list` in the inverted-index dedup family. Output
    * struct(df, ids, ws).
    */
  def boundedPostings(id: Column, weight: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedPostings(ColumnBridge.expression(id),
        ColumnBridge.expression(weight), cap).toAggregateExpression())

  /** Map-only MinHash signature array (null when no shingles). */
  def minhashSig(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), n, k))

  /** Cosine similarity of two float/double array columns — codegen'd
    * replacement for the zip_with+aggregate formulation (bit-identical
    * operation order).
    */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product of two float/double array columns (same kernel family). */
  def dotProd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProd(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Int8 scalar quantization codes of a float/double embedding column
    * (4× narrower storage/shuffle; engine-portable code values).
    */
  def quantizeI8(v: Column): Column =
    ColumnBridge.column(QuantizeI8(ColumnBridge.expression(v)))

  /** The quantization scale (127/max|x|) paired with quantizeI8. */
  def quantizeScale(v: Column): Column =
    ColumnBridge.column(QuantizeScale(ColumnBridge.expression(v)))

  /** Exact integer dot product of two int8 code arrays. */
  def dotI8(a: Column, b: Column): Column =
    ColumnBridge.column(DotI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** PQ codeword ids (array<int>, one per subspace) of an int8 code
    * vector against a plan-shipped flat codebook.
    */
  def pqEncode(codes: Column, cb: Array[Long], m: Int, k: Int): Column =
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(codes), cb.toSeq, m, k))

  /** Image header decode of a binary payload: [formatCode, width,
    * height] parsed from real PNG/JPEG/GIF header bytes (GraftMedia);
    * NULL for unrecognized payloads.
    */
  def imageDims(payload: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(payload)))
}
