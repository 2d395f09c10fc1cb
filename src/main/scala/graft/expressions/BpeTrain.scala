package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-train BPE aggregate: `graft_bpe_train(tokens, R)` over a corpus
  * of `array<string>` token rows → the first R learned merge rules as
  * `array<struct<a, b, pf>>` in training order (Sennrich '16).
  *
  * Why an aggregate and not a Spark-side loop: BPE training iterates a
  * data-dependent argmax, but every round after the initial word count
  * runs over the VOCABULARY relation — metadata-scale (Zipf: ~10⁷
  * distinct words for a web-scale corpus) — not the corpus. The
  * declarative round loop this replaces (per-round TakeOrdered argmax +
  * crossJoin fuse + localCheckpoint) was asymptotically right but paid
  * R × (job + plan + checkpoint) constants ≈ 170 ms/round on a
  * few-thousand-row relation; at R = 30k (a production vocab) it is
  * unrunnable. This operator is the standard production trainer shape
  * (corpus-sized word counting distributed, vocab-sized merge iteration
  * in one process — what single-node tokenizer trainers do after a
  * distributed count): the partial aggregate builds per-task word-count
  * maps (map-side combine: the shuffle carries one distinct-words map
  * per task, never corpus rows), and the final task trains on the merged
  * vocab. Memory: the final map is the global vocab (~1 GB at 10⁷
  * entries) — beyond that, floor the count map with the usual
  * `min_count` prune before training, which drops only the Zipf tail.
  *
  * Semantics are EXACTLY the declarative/oracle CTE chain's, which
  * BpePropSpec pins: per round, count ALL adjacent symbol pairs
  * (overlapping runs included: 'a a a' contributes (a,a) twice) weighted
  * by word frequency; argmax under (pf DESC, a ASC, b ASC) with string
  * order = UTF-8 byte order (code-point compare below — Java
  * `String.compareTo` is UTF-16 code-unit order, which disagrees above
  * the BMP); fuse greedily left-to-right, the merged symbol becoming the
  * new left neighbor. A round with no remaining pairs stops the train —
  * mirroring the declarative spelling, whose empty argmax relation
  * produced no further rows. Symbols start as CODE POINTS (the `(?s)(.)`
  * wrap regex matched per code point).
  *
  * BpeAggSpec holds the executable parity argument: the aggregate equals
  * a naive list-fold reference on random corpora, is invariant under
  * input partitioning, and reproduces the declarative loop's merge table
  * on the harness corpus (the DuckDB oracle then re-checks the same
  * chain cross-engine).
  */
case class BpeTrain(
    tokens: Expression,
    rounds: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  private lazy val roundsVal: Int = rounds.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(tokens, rounds)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType),
      StructField("b", StringType),
      StructField("pf", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_bpe_train"

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) if rounds.foldable && rounds.dataType == IntegerType =>
      val r = rounds.eval()
      if (r != null && r.asInstanceOf[Int] >= 1 && r.asInstanceOf[Int] <= 100000)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_train rounds must be a literal int in [1, 100000], got $r")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_train requires (array<string>, int literal), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val arr = tokens.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        val t = a.getUTF8String(i)
        if (t != null) {
          // double lookup only on first sighting: the transient key
          // aliases a reused row buffer, so clone ONLY when inserting
          // (Zipf input → almost all updates hit an existing key)
          buf.get(t) match {
            case Some(c) => buf.update(t, c + 1L)
            case None => buf.update(t.clone(), 1L)
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (w, c) =>
      a.update(w, a.getOrElse(w, 0L) + c)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val merges = BpeTrain.train(
      buf.iterator.map { case (w, c) => (w.toString, c) }, roundsVal)
    new GenericArrayData(merges.map { case (a, b, pf) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(a), UTF8String.fromString(b), pf))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map(_._1.getBytes)
    val bb = java.nio.ByteBuffer.allocate(
      4 + items.length * 12 + bytes.map(_.length).sum)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putLong(items(i)._2)
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
    }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val buf = createAggregationBuffer()
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val c = bb.getLong()
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(UTF8String.fromBytes(arr), c)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BpeTrain =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BpeTrain =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeTrain =
    copy(tokens = newChildren(0), rounds = newChildren(1))
}

object BpeTrain {

  /** UTF-8 byte order == code-point order; Java String order is UTF-16
    * code-unit order. Compare by code point so ties break exactly like
    * the engines' binary string ORDER BY. */
  private[expressions] def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  private def toSymbols(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Greedy left-to-right single-rule fusion — the merged token becomes
    * the new left neighbor (BpePropSpec's reference fold). Returns the
    * input array unchanged (same object) when the rule never fires, so
    * untouched words cost no allocation per round. */
  private def fuse(syms: Array[String], a: String, b: String): Array[String] = {
    var hit = false
    var i = 1
    while (!hit && i < syms.length) {
      if (syms(i) == b && syms(i - 1) == a) hit = true
      i += 1
    }
    // the pre-scan over-approximates (a match consumed as a RIGHT side
    // can't start another), but a false positive only costs the copy
    if (!hit) return syms
    val out = new mutable.ArrayBuffer[String](syms.length)
    i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b)
        out(out.length - 1) = a + b
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** The train loop over a (word, freq) vocabulary. Exposed for the
    * parity spec. */
  def train(vocab: Iterator[(String, Long)], rounds: Int): Array[(String, String, Long)] = {
    var entries = vocab.map { case (w, f) => (toSymbols(w), f) }.toArray
    val out = new mutable.ArrayBuffer[(String, String, Long)](rounds)
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      entries.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val c = counts.get(k)
          counts.put(k, if (c == null) f else c + f)
          i += 1
        }
      }
      if (counts.isEmpty) { exhausted = true }
      else {
        var bestA: String = null
        var bestB: String = null
        var bestPf = Long.MinValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val (a, b) = e.getKey
          val pf = e.getValue.longValue()
          val better = pf > bestPf ||
            (pf == bestPf && {
              val ca = cpCompare(a, bestA)
              ca < 0 || (ca == 0 && cpCompare(b, bestB) < 0)
            })
          if (better) { bestA = a; bestB = b; bestPf = pf }
        }
        out += ((bestA, bestB, bestPf))
        entries = entries.map { case (syms, f) => (fuse(syms, bestA, bestB), f) }
        r += 1
      }
    }
    out.toArray
  }
}
