package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** `topk_by(payload, order, k, desc)` — per-group top-k as an aggregate
  * function with a bounded heap, the scale-correct alternative to
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`:
  *
  *  - The window form sorts every group's full row set (Spark's
  *    WindowGroupLimit prunes rows but still requires the partial sort on
  *    every partition). The aggregate form never sorts more than the k
  *    survivors per group: O(n log k) heap updates, no Sort node at all.
  *  - As a declared aggregate it gets partial aggregation for free:
  *    map-side heaps reduce each (group, mapper) to ≤ k rows before the
  *    shuffle — at 1000 executors × 1M rows/group, the exchange carries
  *    k·mappers rows per group instead of the group's entire row set.
  *
  * Returns `array<payloadType>` of the top-k payloads, sorted by the
  * order key (descending when `desc`, the "top" sense; ascending
  * otherwise = bottom-k). Null order keys are skipped (window ranking
  * would sort them first/last; a dedup/top-k pipeline wants them out).
  *
  * Determinism: like any top-k, ties AT the k boundary are resolved
  * arbitrarily — pass a unique composite order (e.g.
  * `struct(score, id)`) for reproducible results; struct orderings
  * compare lexicographically.
  */
case class TopKBy(
    left: Expression, // payload
    right: Expression, // order key
    k: Int,
    desc: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {
  require(k > 0, s"topk_by needs k > 0, got $k")

  override def prettyName: String = "topk_by"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(left.dataType, left.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(right.dataType, prettyName)

  // ascending base ordering over the order key's type; "top" = largest
  // under it when desc (the heap keeps the best k under `better`)
  @transient private lazy val baseOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(right.dataType)

  private[expr] def compareKeys(a: Any, b: Any): Int = {
    val c = baseOrdering.compare(a, b)
    if (desc) -c else c
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val key = right.eval(input)
    if (key != null) {
      // admission check BEFORE copying: at steady state almost every row
      // loses to the heap's current worst, so the copy is the exception,
      // not the rule
      if (buf.size < k || compareKeys(key, buf.worstKey(this)) < 0) {
        val payload = left.eval(input)
        buf.add(copyValue(key, right.dataType), copyValue(payload, left.dataType), k, this)
      }
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.foreach { case (key, payload) => a.add(key, payload, k, this) }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted(this).map(_._2))

  // ---- shuffle format: length-prefixed UnsafeRows of (order, payload) ----
  @transient private lazy val rowType =
    StructType(Seq(StructField("o", right.dataType, nullable = false),
      StructField("p", left.dataType, left.nullable)))
  @transient private lazy val proj = UnsafeProjection.create(rowType)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, payload) =>
      val row = proj(InternalRow(key, payload))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, size)
      // values live inside rowBytes, which this buffer owns — safe to
      // reference without another copy
      buf.add(row.get(0, right.dataType), row.get(1, left.dataType), k, this)
      i += 1
    }
    buf
  }

  private def copyValue(v: Any, dt: DataType): Any = v match {
    case null => null
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case other => other // primitives / Decimal / CalendarInterval are immutable
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKBy =
    copy(left = l, right = r)
}

/** Bounded max-heap on the *worst* retained element: admits while under
  * k, then replaces the worst when a better key arrives. */
final class TopKBuffer {
  // heap of (orderKey, payload); ordering is supplied per-call from the
  // owning TopKBy (the buffer itself must stay serialization-agnostic)
  private var heap: mutable.PriorityQueue[(Any, Any)] = _

  private def ensureHeap(agg: TopKBy): Unit =
    if (heap == null)
      heap = mutable.PriorityQueue.empty[(Any, Any)](
        // PriorityQueue dequeues its Ordering's MAX — rank by "badness"
        // (compareKeys > 0 = worse) so head is the worst retained element
        (x: (Any, Any), y: (Any, Any)) => agg.compareKeys(x._1, y._1))

  def size: Int = if (heap == null) 0 else heap.size

  def worstKey(agg: TopKBy): Any = heap.head._1

  def add(key: Any, payload: Any, k: Int, agg: TopKBy): Unit = {
    ensureHeap(agg)
    if (heap.size < k) heap.enqueue((key, payload))
    else if (agg.compareKeys(key, heap.head._1) < 0) {
      heap.dequeue()
      heap.enqueue((key, payload))
    }
  }

  def foreach(f: ((Any, Any)) => Unit): Unit =
    if (heap != null) heap.foreach(f)

  /** Elements best-first (the output order). */
  def sorted(agg: TopKBy): Array[(Any, Any)] = {
    val arr = if (heap == null) Array.empty[(Any, Any)] else heap.toArray
    scala.util.Sorting.stableSort(arr,
      (x: (Any, Any), y: (Any, Any)) => agg.compareKeys(x._1, y._1) < 0)
    arr
  }
}

object TopKBy {
  /** `topKBy(struct(cols...), order, k)` — top-k payloads per group by
    * `order` descending (ascending when `asc`). */
  def apply(payload: Column, order: Column, k: Int, desc: Boolean): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(payload), ColumnBridge.expression(order),
        k, desc).toAggregateExpression())

  def top(payload: Column, order: Column, k: Int): Column =
    apply(payload, order, k, desc = true)

  def bottom(payload: Column, order: Column, k: Int): Column =
    apply(payload, order, k, desc = false)
}
