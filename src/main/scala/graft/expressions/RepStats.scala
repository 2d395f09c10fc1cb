package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document repetition statistics:
  * `graft_repstats(words)` over `array<string>` →
  * `struct<top_term_n: bigint, n_bigrams: bigint, n_distinct_bigrams: bigint>`
  * — the row kernel under the Gopher-style repetition filter
  * (`Curation.repetitionScore`; thresholds from Rae et al. 2021).
  *
  * The column-algebra spelling runs three interpreted passes per row:
  * an `aggregate` fold over `array_sort(words)` for the longest run
  * (whose lambda re-evaluates the run expression twice per element —
  * lambda bodies can't bind locals), a `transform` building the bigram
  * strings, and an `array_distinct` over them. None of those lambdas
  * codegen; at corpus scale the interpreter tax dominates the query
  * (measured 3.2× the oracle in r12). This kernel is one JVM pass:
  * a token-count hash map (max multiplicity == longest sorted run, the
  * same value without the O(n log n) sort) and a bigram hash set.
  *
  * Parity contract — bit-identical to the built-in spelling and the
  * DuckDB oracle:
  *  - `top_term_n` = max token multiplicity (equals the longest run in
  *    the sorted array — sorting groups equal tokens into runs);
  *  - bigram identity is CONCAT equality (`w[i] || ' ' || w[i+1]`),
  *    exactly the string both engines build — for arbitrary arrays
  *    ("a b","c") and ("a","b c") are the SAME bigram, matching the
  *    `concat` spelling, not tuple equality (the producers here are
  *    `split(text, ' ')` tokens, where the two coincide);
  *  - `n_bigrams` = max(len − 1, 0).
  * Null array → null (nullSafeEval); null ELEMENTS abort loudly — the
  * split() producers never emit them, and silently treating null as ""
  * would fabricate repetition.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_repstats requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_term_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))
  override def prettyName: String = "graft_repstats"

  override def nullSafeEval(arr: Any): Any =
    RepStats.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = RepStats.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {
  private val Space = UTF8String.fromString(" ")

  /** The fused loop; static so generated and interpreted eval share one
    * implementation (WindowHash/PackedPairs precedent). */
  def compute(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](Math.max(16, n * 2))
    val bigrams = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    var top = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w == null) throw new IllegalArgumentException(
        "graft_repstats: null token in input array; tokens must be non-null")
      val c = counts.merge(w, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (c > top) top = c.longValue()
      if (prev != null) bigrams.add(UTF8String.concatWs(Space, prev, w))
      prev = w
      i += 1
    }
    new GenericInternalRow(Array[Any](
      top, Math.max(n - 1, 0).toLong, bigrams.size.toLong))
  }
}
