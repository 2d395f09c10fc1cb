package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group MIN-top-k aggregate: `graft_topk_min(key, id, k)`
  * → `array<struct<key, id>>`, the k smallest (key, id) pairs under
  * the ascending total order, best (smallest) first.
  *
  * This is [[TopKByCount]]'s design applied to the nearest-neighbor
  * shape: the window spelling of per-query ranking — `row_number()
  * OVER (PARTITION BY q_id ORDER BY dist, id)` then `rank <= k` —
  * shuffles and SORTS every scored candidate per query just to
  * discard all but k. The bounded heap combines each map task down to
  * ≤ k pairs per group BEFORE the exchange, so the shuffle carries
  * O(partitions × queries × k) rows however large the scored relation
  * is — at 10¹⁰ candidates per query that is the difference between
  * shuffling the corpus and merging a handful of heaps. This is the
  * production respelling the ANN-family scaladocs name; the
  * registered queries keep the window spelling ONLY where the oracle
  * pins rank semantics the array position already carries here.
  *
  * Determinism: (key ASC, id ASC) is a total order over distinct ids,
  * so the k winners and their order are unique — independent of
  * partitioning or merge order. Null keys/ids are ignored.
  *
  * Key type: BIGINT or DOUBLE. Doubles ride the heap through the
  * order-isomorphic sortable-bits transform (the Lucene
  * `doubleToSortableLong` trick, self-inverse: flip the low 63 bits of
  * negative-sign bit patterns), with −0.0 normalized to +0.0 FIRST so
  * the kernel's ordering can never split a (−0.0, +0.0) tie that the
  * SQL comparison (and the DuckDB oracle's ORDER BY) treats as equal;
  * NaN sorts greatest (worst for a min-ranking) — callers ranking by
  * similarity DESC pass the negated score as the key.
  *
  * k must be a foldable int in [1, 1024]: the buffer is O(k) per
  * group per task; the operator's point is that k stays small. */
case class TopKMin(
    key: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  private lazy val kVal: Int = k.eval().asInstanceOf[Int]
  private lazy val doubleKey: Boolean = key.dataType == DoubleType

  /** Order-isomorphic double→long (self-inverse on the bit pattern):
    * −0.0 normalized to +0.0, then negative-sign patterns get their
    * low 63 bits flipped so SIGNED long comparison matches double
    * ordering (NaN's pattern lands greatest). */
  private def toSortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d + 0.0)
    if (b < 0) b ^ 0x7fffffffffffffffL else b
  }
  private def fromSortable(l: Long): Double =
    java.lang.Double.longBitsToDouble(if (l < 0) l ^ 0x7fffffffffffffffL else l)

  // PriorityQueue dequeues the Ordering-LARGEST element; "largest" =
  // worst = greatest (key, id), so the head is the eviction candidate.
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val byKey = java.lang.Long.compare(a._1, b._1)
      if (byKey != 0) byKey else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def children: Seq[Expression] = Seq(key, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", key.dataType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_topk_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if ((key.dataType != LongType && key.dataType != DoubleType) ||
        id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_min requires (BIGINT|DOUBLE key, BIGINT id), got " +
          s"(${key.dataType.simpleString}, ${id.dataType.simpleString})")
    else if (!k.foldable || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_topk_min requires a literal int k")
    else {
      val kv = k.eval().asInstanceOf[Int]
      if (kv >= 1 && kv <= 1024) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_topk_min k must be in [1, 1024], got $kv")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], kv: Long, iv: Long): Unit =
    if (buf.size < kVal) {
      buf.enqueue((kv, iv))
    } else if (worstFirst.compare(buf.head, (kv, iv)) > 0) { // head is worse
      buf.dequeue()
      buf.enqueue((kv, iv))
      ()
    }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) {
      val kl = if (doubleKey) toSortable(kv.asInstanceOf[Double])
               else kv.asInstanceOf[Long]
      offer(buf, kl, iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, Long)],
      b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach { case (kv, iv) => offer(a, kv, iv) }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val best = buf.toArray.sorted(worstFirst) // ascending (key, id) = best first
    new GenericArrayData(best.map { case (kv, iv) =>
      val keyOut: Any = if (doubleKey) fromSortable(kv) else kv
      new GenericInternalRow(Array[Any](keyOut, iv))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val items = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + items.length * 16)
    bb.putInt(items.length)
    items.foreach { case (kv, iv) => bb.putLong(kv); bb.putLong(iv) }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val buf = createAggregationBuffer()
    val n = bb.getInt()
    // offer (not enqueue) so the O(k) bound holds locally even for
    // foreign bytes — serialized buffers we wrote are already ≤ k
    (0 until n).foreach(_ => offer(buf, bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMin =
    copy(key = newChildren(0), id = newChildren(1), k = newChildren(2))
}
