package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded distinct-set aggregate: `graft_set_cap(value, cap)` →
  * `array<string>` of the group's distinct values SORTED ascending, or
  * NULL the moment the group's distinct count exceeds `cap`.
  *
  * This is the scale-safe spelling of "collect_set, but only for small
  * groups": a plain `collect_set` on a skewed key (a boilerplate
  * shingle present in every crawl domain) accumulates an unbounded
  * set on one reducer before any post-filter can drop it. Here the
  * buffer holds AT MOST `cap` values plus an overflow flag — once a
  * partial sees its (cap+1)-th distinct value it flips to overflowed
  * and FREES the set, and overflow is monotone under merge (a partial
  * that overflowed alone proves the union did too), so per-group state
  * is O(cap) at every stage of the aggregation however skewed the key.
  * Callers that would have filtered `size(set) <= cap` filter
  * `IS NOT NULL` instead and read the dropped count off the same rows.
  *
  * Determinism: output is the sorted distinct set (binary UTF8 order),
  * independent of partitioning and merge order. Null values are
  * ignored; an all-null/empty group yields an empty array (not null —
  * null MEANS overflow). cap must be a foldable int in [1, 4096]. */
case class CappedSet(
    value: Expression,
    cap: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedSet.Buf] {

  private lazy val capVal: Int = cap.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(value, cap)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_set_cap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_set_cap requires a STRING value, got ${value.dataType.simpleString}")
    else if (!cap.foldable || cap.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_set_cap requires a literal int cap")
    else {
      val cv = cap.eval().asInstanceOf[Int]
      if (cv >= 1 && cv <= 4096) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_set_cap cap must be in [1, 4096], got $cv")
    }

  override def createAggregationBuffer(): CappedSet.Buf = new CappedSet.Buf()

  private def add(buf: CappedSet.Buf, v: UTF8String): Unit =
    if (!buf.overflowed && !buf.set.contains(v)) {
      if (buf.set.size >= capVal) {
        buf.overflowed = true
        buf.set.clear() // free eagerly — the bound is the point
      } else {
        // the input UTF8String aliases a reused buffer — copy before keeping
        buf.set.add(v.copy())
        ()
      }
    }

  override def update(buf: CappedSet.Buf, input: InternalRow): CappedSet.Buf = {
    val v = value.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: CappedSet.Buf, b: CappedSet.Buf): CappedSet.Buf = {
    if (b.overflowed) { a.overflowed = true; a.set.clear() }
    else b.set.foreach(add(a, _)) // already copies, but idempotent and bounded
    a
  }

  override def eval(buf: CappedSet.Buf): Any =
    if (buf.overflowed) null
    else new GenericArrayData(buf.set.toArray.sorted(CappedSet.binaryOrder).map(x => x: Any))

  override def serialize(buf: CappedSet.Buf): Array[Byte] = {
    val items = buf.set.toArray.map(_.getBytes)
    val size = 1 + 4 + items.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(items.length)
    items.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedSet.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CappedSet.Buf()
    buf.overflowed = bb.get() == 1
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      // add() (not raw insert) keeps the O(cap) bound local even for
      // foreign bytes, same defensive rule as TopKMin.deserialize
      add(buf, UTF8String.fromBytes(b))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedSet =
    copy(value = newChildren(0), cap = newChildren(1))
}

object CappedSet {
  /** Mutable per-group state: distinct values seen so far (≤ cap), or
    * the overflow flag with the set already freed. */
  final class Buf {
    var overflowed: Boolean = false
    val set: mutable.HashSet[UTF8String] = mutable.HashSet.empty
  }
  val binaryOrder: Ordering[UTF8String] = new Ordering[UTF8String] {
    override def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
  }
}
