package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded-heap top-k aggregate: keeps the k largest
  * (value, id) pairs under the TOTAL order (value desc, id asc) — the
  * shuffle-bounding form of "top-k per group". The window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`)
  * shuffles EVERY row of every group and sorts whole groups; this
  * aggregate's partial states hold at most k pairs, so map-side
  * combine means at most k rows per (map partition, group) ride the
  * shuffle and a hot group costs O(k) memory instead of a
  * group-sized sort partition. capPerGroupSkewSafe solves the same
  * problem by probabilistic pre-thinning; this is the exact
  * deterministic form.
  *
  * Unlike a sketch, top-k under a total order is a pure SELECTION:
  * the result is independent of arrival and merge order (duplicate
  * (value, id) pairs are indistinguishable), so the output is
  * hash-checkable against the window oracle — no guarantee booleans
  * needed. Update is O(log k) via a worst-first heap; merge pushes
  * and re-trims. */
case class TopKAgg(
    left: Expression,   // value: LongType
    right: Expression,  // id: LongType
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  /** SQL-registered (graft_topk), so mis-typed arguments must surface
    * as a clean AnalysisException naming the function — not a raw
    * executor-side ClassCastException from eval's asInstanceOf. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires (BIGINT value, BIGINT id) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Heap dequeues its MAX — ordered so the max is the WORST kept
    * pair (smallest value, then largest id). Explicit compares, NOT
    * Ordering.by(-v): negation overflows at Long.MinValue and would
    * rank the minimum value as the best. */
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // smaller value = worse = "larger"
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id = worse
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Long, Long)], input: InternalRow)
      : mutable.PriorityQueue[(Long, Long)] = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null) {
      buf.enqueue((v.asInstanceOf[Long], id.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    // ascending by worstFirst = best (largest value, lowest id) first
    new GenericArrayData(buf.toArray
      .sorted(worstFirst)
      .map { case (v, id) => InternalRow(v, id): Any })

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, id) => out.writeLong(v); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}
