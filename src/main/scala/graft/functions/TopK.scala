package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded-heap top-k aggregate: collects the `k` smallest values of any
  * orderable input (for graft's similarity queries the input is a
  * `struct(-cos_sim, cand_id, ...)`, so "smallest" = highest cosine with a
  * deterministic id tiebreak) and returns them as a sorted ascending array —
  * exactly `slice(array_sort(collect_list(x)), 1, k)`, but with the partial
  * aggregation buffer capped at `k` entries.
  *
  * Why it exists (VERDICT r01 §What's-wrong #1): `collect_list` is an
  * ObjectHashAggregate whose *partial* buffer is the full per-group list, so
  * a two-phase top-k built on it still shuffles every scored row and buffers
  * O(N) structs per final group — linear growth that OOMs at 100 TB. This
  * aggregate's map-side partial collapses each partition to ≤ k rows per
  * group before the exchange, so the shuffle carries O(groups·partitions·k)
  * and the final merge buffers at most 2k values at a time. That also makes
  * per-query salting unnecessary: partial aggregation IS the per-partition
  * top-k.
  *
  * Semantics match the declarative form it replaces (spec-asserted
  * result-identical): null inputs are skipped like `collect_list`, ordering
  * is Spark's interpreted ordering for the input type (struct = field-by-
  * field lexicographic, the same ordering `array_sort` uses).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"graft_top_k requires k > 0, got $k")

  // max-heap over the kept k-smallest: head is the current worst, evicted
  // when a smaller value arrives
  private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ord)

  private def insert(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < k) {
      buf.enqueue(InternalRow.copyValue(v))
    } else if (ord.lt(v, buf.head)) {
      buf.dequeue()
      buf.enqueue(InternalRow.copyValue(v))
    }

  override def update(buf: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(insert(buf, _)) // already copied on the other side
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord))

  private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    buf.foreach { v =>
      val rowBytes = proj(InternalRow(v)).getBytes
      dos.writeInt(rowBytes.length)
      dos.write(rowBytes)
    }
    dos.writeInt(-1)
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    var len = in.readInt()
    while (len >= 0) {
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      // rowBytes is freshly allocated per element, safe to alias — but the
      // heap outlives this call, so copy out of the row view
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      len = in.readInt()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}
