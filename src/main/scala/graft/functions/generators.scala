package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, SpecificInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping token-window chunks as a table-generating function (the
  * UDTF tier of SURVEY.md §2.14): one `(chunk_idx, chunk)` row at a time,
  * streamed per document.
  *
  * Same chunk semantics as [[TokenChunks]] + `posexplode` (chunk j covers
  * tokens [j·stride, j·stride+window); `ChunkRowsSpec` pins the two row
  * sets to each other), but the array formulation materializes EVERY
  * chunk of a document at once — with window > stride that is an
  * amplified copy of the whole document (window/stride ×) held as one
  * array value before the explode. For book-length documents at 100 TB
  * that per-row allocation is the difference between streaming through
  * `GenerateExec` in O(tokens) memory and spiking O(tokens·window/stride)
  * per document: the generator tokenizes once and builds each chunk on
  * demand.
  *
  * Registered as `chunk_rows(text, window, stride)` — SQL users get
  * `LATERAL VIEW chunk_rows(...)`.
  */
case class ChunkRows(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(window >= 1 && stride >= 1,
    s"need window,stride >= 1, got window=$window stride=$stride")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def prettyName: String = "chunk_rows"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Iterator.empty
    else {
      val toks = GraftStrings.tokens(text.asInstanceOf[UTF8String])
      val n = toks.length
      new Iterator[InternalRow] {
        private var start = 0
        private var idx = 0
        override def hasNext: Boolean = start < n
        override def next(): InternalRow = {
          val end = math.min(start + window, n)
          val sb = new java.lang.StringBuilder
          var i = start
          while (i < end) {
            if (i > start) sb.append(' ')
            sb.append(toks(i))
            i += 1
          }
          val row = new GenericInternalRow(2)
          row.update(0, idx)
          row.update(1, UTF8String.fromString(sb.toString))
          idx += 1
          start += stride
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkRows =
    copy(child = newChild)
}

/** All unordered pairs `(doc_a, doc_b)` with `doc_a < doc_b` from one
  * array<bigint> column, streamed one row at a time.
  *
  * The explode(ds) × explode(ds) + `a < b` formulation materializes a
  * copy of the whole array PER element before the second explode (an
  * O(|ds|²)-element intermediate per posting list) and generates the
  * full |ds|² cross product only to filter half of it away. This
  * generator sorts the array once and emits exactly the C(|ds|,2)
  * surviving pairs in O(|ds|) memory — the pair-enumeration kernel of
  * the inverted-index dedup family, whose |ds| is bounded by the
  * hot-shingle cap upstream.
  */
case class LongPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: toLongArray on a null element is a
    // query-killing NPE on one ArrayData implementation and a silent 0L
    // on another — reject at analysis time instead
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-null elements, got $t")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false)))

  override def prettyName: String = "long_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      java.util.Arrays.sort(arr)
      val n = arr.length
      if (n < 2) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        // ONE mutable primitive-field row per posting list, reused for
        // every emitted pair: the generator's consumer is always an
        // UnsafeProjection copy boundary (shuffle input / aggregate
        // input), the same contract UnsafeProjection itself relies on
        // when reusing ITS output row. A fresh GenericInternalRow per
        // pair cost two boxed longs + an Object[] + the row — at an
        // amplified corpus that is hundreds of millions of emissions.
        private val row = new SpecificInternalRow(Seq(LongType, LongType))
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          row.setLong(0, arr(i))
          row.setLong(1, arr(j))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): LongPairs =
    copy(child = newChild)
}

/** All unordered pairs from one posting list WITH each endpoint's
  * carried weight: `(doc_a, w_a, doc_b, w_b)`, `doc_a < doc_b`, weights
  * staying aligned with their ids through the sort. Same streamed
  * O(|ds|)-memory enumeration as [[LongPairs]]; the extra two columns
  * are what let the Jaccard pipeline compute its denominator inline at
  * the pair aggregate instead of joining a per-doc count table back
  * onto the pair stream — at an amplified corpus those joins were two
  * extra exchanges plus sorts of hundreds of millions of rows.
  *
  * Input: two array<bigint> columns of equal length (ids, weights) —
  * the `ids`/`ws` halves of a [[BoundedPostings]] result.
  */
case class LongPairsWeighted(ids: Expression, ws: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(ids, ws)

  override def checkInputDataTypes(): TypeCheckResult =
    (ids.dataType, ws.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> columns with non-null " +
          s"elements, got ($a, $b)")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("w_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("w_b", LongType, nullable = false)))

  override def prettyName: String = "long_pairs_weighted"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val vi = ids.eval(input)
    val vw = ws.eval(input)
    if (vi == null || vw == null) Iterator.empty
    else {
      val idArr = vi.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      val wArr = vw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      require(idArr.length == wArr.length,
        s"$prettyName: ids(${idArr.length}) and ws(${wArr.length}) differ")
      val n = idArr.length
      if (n < 2) Iterator.empty
      else {
        // argsort by id, weights riding along (lists are cap-bounded —
        // ~1e3 entries — so the boxed index sort is immaterial)
        val order = Array.range(0, n)
          .sortBy(idArr(_))
        val sid = order.map(idArr(_))
        val sw = order.map(wArr(_))
        new Iterator[InternalRow] {
          private var i = 0
          private var j = 1
          // reused primitive-field row — see the LongPairs note; with
          // four long fields the per-pair saving is ~4 boxed longs +
          // Object[4] + row header per emission
          private val row = new SpecificInternalRow(
            Seq(LongType, LongType, LongType, LongType))
          override def hasNext: Boolean = i < n - 1
          override def next(): InternalRow = {
            row.setLong(0, sid(i))
            row.setLong(1, sw(i))
            row.setLong(2, sid(j))
            row.setLong(3, sw(j))
            j += 1
            if (j == n) { i += 1; j = i + 1 }
            row
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongPairsWeighted =
    copy(ids = newChildren(0), ws = newChildren(1))
}

/** All `(doc_a, doc_b, dist)` pairs within one LSH bucket whose simhash
  * hamming distance is ≤ `maxDist`, with `doc_a < doc_b` — the verify
  * step of pigeonhole-banded simhash search fused INTO pair enumeration.
  *
  * The self-join formulation (banded ⋈ banded on (band, value) + a
  * hamming filter) materializes every candidate pair as a join row
  * before the filter sees it — ~9M wide rows at sf0.1 for ~300k
  * survivors, and the join machinery (not the popcounts) dominates the
  * query. This generator takes the bucket's collected (id, sig) entries
  * and runs the XOR+popcount check inline, so non-pairs cost two longs
  * of arithmetic and are never materialized. Memory is O(bucket): the
  * same duplicate-key run a sort-merge join would buffer for the
  * cartesian-per-key anyway — and bucket occupancy is the banding
  * design's own lever (band width), same as the join had.
  *
  * Input: array<struct<id bigint, sig bigint>> from `collect_list` over
  * the bucket. Pairs colliding in several bands still emit once per
  * band — callers de-duplicate, as with the join formulation.
  */
case class HammingSigPairs(child: Expression, maxDist: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(maxDist >= 0, s"need maxDist >= 0, got $maxDist")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got $t")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("dist", IntegerType, nullable = false)))

  override def prettyName: String = "hamming_sig_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      if (n < 2) Iterator.empty
      else {
        val ids = new Array[Long](n)
        val sigs = new Array[Long](n)
        var i = 0
        while (i < n) {
          val s = arr.getStruct(i, 2)
          ids(i) = s.getLong(0)
          sigs(i) = s.getLong(1)
          i += 1
        }
        new Iterator[InternalRow] {
          private var a = 0
          private var b = 1
          // reused primitive-field row (see LongPairs). The search for
          // the next surviving pair runs LAZILY in hasNext, so the
          // shared row is only overwritten AFTER the consumer has had
          // the hasNext→next cycle to copy the previous one — mutating
          // it eagerly inside next() would corrupt the row the caller
          // is still holding.
          private val row = new SpecificInternalRow(
            Seq(LongType, LongType, IntegerType))
          private var found = false
          private var searched = false
          private def search(): Unit = {
            found = false
            while (!found && a < n - 1) {
              val d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
              if (d <= maxDist && ids(a) != ids(b)) {
                row.setLong(0, math.min(ids(a), ids(b)))
                row.setLong(1, math.max(ids(a), ids(b)))
                row.setInt(2, d)
                found = true
              }
              b += 1
              if (b == n) { a += 1; b = a + 1 }
            }
            searched = true
          }
          override def hasNext: Boolean = {
            if (!searched) search()
            found
          }
          override def next(): InternalRow = {
            if (!searched) search()
            searched = false
            row
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HammingSigPairs =
    copy(child = newChild)
}
