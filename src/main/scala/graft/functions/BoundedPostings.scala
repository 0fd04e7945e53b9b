package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Exact doc-frequency count + posting list CAPPED at `cap`+1 entries,
  * in one native imperative aggregate (SURVEY.md §2.14 — same tier as
  * collect_list itself, which it replaces). Each posting entry carries
  * the id AND a caller-chosen per-id weight (the Jaccard pipeline
  * passes the doc's distinct-shingle count), so downstream pair
  * enumeration can emit (id_a, w_a, id_b, w_b) and compute similarity
  * WITHOUT joining a per-doc side table back onto the (much larger)
  * pair stream — at an amplified corpus those two joins were two extra
  * exchanges plus sorts of hundreds of millions of pair rows.
  *
  * The inverted-index dedup family must drop "stop-shingles" (doc-freq >
  * cap) BEFORE any posting list is materialized — a plain `collect_list`
  * would buffer an unbounded list for a hot shingle at 100 TB before the
  * filter could discard it. This buffer stops appending once the cap is
  * exceeded (list length never passes cap+1, ≈16 KB at cap=1000) while
  * `df` keeps the exact count, so ONE partial-aggregated exchange yields
  * both the hot-key verdict and, for keys that survive it, the complete
  * posting list — the previous count → anti-join → collect_list plan
  * paid two extra exchanges for the same guarantee. Implemented as a
  * TypedImperativeAggregate over raw long arrays (a Scala `Aggregator`
  * with a List buffer measured ~35% slower from encoder overhead).
  *
  * Entry order is partition-dependent; callers must treat the list as
  * a set (the Jaccard pipeline sorts pair endpoints downstream).
  * Output: struct(df: bigint, ids: array<bigint>, ws: array<bigint>),
  * with `ws(i)` the weight that arrived with `ids(i)`.
  */
case class BoundedPostings(
    child: Expression,
    weight: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PostingBuffer] with BinaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def left: Expression = child
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (id, weight) arguments, got " +
        s"(${child.dataType}, ${weight.dataType})")

  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("ws", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_postings"

  private def maxKeep = cap + 1

  override def createAggregationBuffer(): PostingBuffer =
    new PostingBuffer(0L, new Array[Long](8), new Array[Long](8), 0)

  private def append(b: PostingBuffer, id: Long, w: Long): Unit =
    if (b.n < maxKeep) {
      if (b.n == b.ids.length) {
        val cap2 = math.min(maxKeep, b.ids.length * 2)
        b.ids = java.util.Arrays.copyOf(b.ids, cap2)
        b.ws = java.util.Arrays.copyOf(b.ws, cap2)
      }
      b.ids(b.n) = id
      b.ws(b.n) = w
      b.n += 1
    }

  override def update(b: PostingBuffer, input: InternalRow): PostingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      b.df += 1
      append(b, v.asInstanceOf[Long],
        if (w == null) 0L else w.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: PostingBuffer, o: PostingBuffer): PostingBuffer = {
    b.df += o.df
    var i = 0
    while (i < o.n && b.n < maxKeep) { append(b, o.ids(i), o.ws(i)); i += 1 }
    b
  }

  override def eval(b: PostingBuffer): Any =
    new GenericInternalRow(Array[Any](b.df,
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(b.ids, b.n)),
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(b.ws, b.n))))

  override def serialize(b: PostingBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 16 * b.n)
    bb.putLong(b.df)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putLong(b.ws(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PostingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val df = bb.getLong
    val n = bb.getInt
    val ids = new Array[Long](math.max(n, 8))
    val ws = new Array[Long](math.max(n, 8))
    var i = 0
    while (i < n) { ids(i) = bb.getLong; ws(i) = bb.getLong; i += 1 }
    new PostingBuffer(df, ids, ws, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedPostings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedPostings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedPostings =
    copy(child = newLeft, weight = newRight)
}

/** Mutable aggregation state for [[BoundedPostings]]: exact count,
  * (id, weight) entries kept so far (`ids/ws(0 until n)`),
  * capacity-doubling append capped at cap+1.
  */
final class PostingBuffer(
    var df: Long, var ids: Array[Long], var ws: Array[Long], var n: Int)
