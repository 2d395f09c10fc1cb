package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Fused SimHash bit-vote aggregate: `graft_simhash(word_hash, n_bits)`.
  *
  * SimHash needs, per group, the per-bit sum of ±1 votes over every
  * word-hash row, then packs vote signs into a fingerprint. The
  * column-algebra spelling is n_bits separate `sum(when((wh >> j) & 1 =
  * 1, 1).otherwise(-1))` aggregates — n_bits predicate evaluations and
  * n_bits aggregation buffer slots bookkept independently per row (the
  * third-slowest family in the r2 bench at 60 bits). This fused
  * aggregate does one tight loop over an int[n_bits] buffer per row and
  * emits the packed fingerprint directly.
  *
  * Parity: identical math to the unfused form and to the DuckDB oracle
  * (votes are exact integer sums; bit j of the result is set iff
  * vote(j) >= 0), asserted equal in SimHashVotesSpec. Partial
  * aggregation works (map-side combine): merge is elementwise vote
  * addition, exactly like summing the per-bit columns.
  *
  * n_bits must be a foldable int in [1, 60]: h60 word hashes carry 60
  * bits, and 60 keeps every fingerprint non-negative in a BIGINT in
  * both engines (no sign-bit games under ANSI overflow checks).
  */
case class SimHashVotes(
    child: Expression,
    bits: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private lazy val nBits: Int = bits.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, bits)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires a BIGINT hash column, got ${child.dataType.simpleString}")
    else if (!bits.foldable || bits.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_simhash requires a literal int bit count")
    else {
      val b = bits.eval().asInstanceOf[Int]
      if (b >= 1 && b <= 60) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"graft_simhash bit count must be in [1, 60], got $b")
    }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](nBits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val wh = v.asInstanceOf[Long]
      var j = 0
      while (j < nBits) {
        buf(j) += ((((wh >>> j) & 1L) << 1) - 1L).toInt // bit set → +1, clear → −1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < nBits) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var r = 0L
    var j = 0
    while (j < nBits) { if (buf(j) >= 0) r |= 1L << j; j += 1 }
    r
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * buf.length)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashVotes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashVotes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashVotes =
    copy(child = newChildren(0), bits = newChildren(1))
}
