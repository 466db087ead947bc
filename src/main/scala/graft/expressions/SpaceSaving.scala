package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded-memory heavy-hitters aggregate: a Misra–Gries
  * summary of at most `capacity` (item → weight) slots, implemented as
  * a Catalyst [[TypedImperativeAggregate]] so partial states build
  * map-side and MERGE across partitions — the O(k)-memory answer to
  * "top tokens over 100 TB" where an exact groupBy's shuffle carries
  * the full vocabulary.
  *
  * Guarantees (Misra–Gries, preserved under the mergeable-summaries
  * merge — Agarwal et al., PODS'12 — for ANY partitioning / merge
  * order, which is what makes a deterministic correctness contract
  * possible on a distributed engine):
  *  - estimate ≤ true count;
  *  - estimate ≥ true count − n/(capacity+1), n = stream length;
  *  - every item with true count > n/(capacity+1) is present.
  * The kept SET itself is layout-dependent (ties evict arbitrarily),
  * so queries hash-check the GUARANTEES against exact counts (the
  * q_approx pattern), not the raw summary; single-partition behavior
  * is additionally pinned exactly by SpaceSavingSpec's Scala replay.
  *
  * Update is the textbook decrement-all form (O(capacity) worst case
  * per unseen item on a full summary — fine for the k ≤ a few hundred
  * this is meant for; the counter-offset variant is the known O(1)
  * upgrade if a profile ever demands it). Merge sums the two maps and
  * subtracts the (capacity+1)-th largest weight from every slot,
  * pruning non-positives — the standard mergeable form. */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  /** SQL-registered (graft_heavy_hitters): reject non-string items at
    * analysis time instead of a raw executor ClassCastException from
    * update's UTF8String cast. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters requires a STRING item argument, got " +
        child.dataType.catalogString)

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < capacity => buf.update(s, 1L)
        case None =>
          // decrement-all by 1, dropping exhausted slots
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1L
            if (c <= 0L) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    SpaceSavingAgg.mergeCapped(buf, other, capacity)

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // sorted keys: a deterministic physical map for a given summary
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)): Array[Any]),
      new GenericArrayData(entries.map(e => java.lang.Long.valueOf(e._2)): Array[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  protected override def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}

object SpaceSavingAgg {
  /** The mergeable-summaries merge rule, THE single implementation:
    * sum `other` into `buf`; if over capacity, subtract the
    * (capacity+1)-th largest weight from every slot and prune
    * non-positives. Shared by the aggregate's partial-state merge and
    * the streaming driver-side fold (CorpusStream.startTokenTrends) —
    * the full-prefix guarantee depends on both paths merging
    * identically, so neither carries its own copy. */
  def mergeCapped(buf: mutable.HashMap[String, Long],
      other: scala.collection.Map[String, Long],
      capacity: Int): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
    if (buf.size > capacity) {
      val cut = buf.values.toArray.sortInPlace()(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - cut
        if (c <= 0L) dead += k else buf.update(k, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }
}
