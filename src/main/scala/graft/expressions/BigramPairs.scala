package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Consecutive word-bigram enumeration: `graft_bigrams(text)` over a
  * space-separated string → `array<struct<w1 string, w2 string>>` with
  * one element per adjacent token pair (n−1 pairs for n tokens; empty
  * array below 2 tokens). Tokenization is exactly `split(text, ' ')`
  * with trailing empties kept — the bigram-LM family's contract, and
  * the DuckDB oracle's `string_split`.
  *
  * Why a kernel: the family's `zip_with(words, slice(words, 2, …))`
  * spelling runs its lambdas on the EXPRESSION INTERPRETER (Spark
  * higher-order functions are never whole-stage-codegen'd) — a
  * reflective tree-walk and a boxed struct per element per row, and
  * the corpus pass is duplicated into two AQE subtrees (model count +
  * scoring join), so the interpreted cost is paid twice; the hot
  * 32-task stage profiled at ~8.6 s CPU at sf0.1 with the lambda
  * spelling. This kernel is one split + one array-build loop per row
  * (the PackedPairs/QuantArray argument). Evaluated once per row and
  * immediately exploded, so per-row codegen buys little over the
  * loop itself: CodegenFallback, deliberately.
  *
  * Zero-copy tokens: `UTF8String.split` returns slices of the input
  * buffer, reused directly as the struct fields. */
case class BigramPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bigrams requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_bigrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(in: Any): Any = {
    // split(text, ' ') semantics: limit -1 keeps trailing empties,
    // matching the SQL split the family tokenizes with
    val words = in.asInstanceOf[UTF8String].split(sep, -1)
    val n = words.length
    if (n < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        out(i) = new GenericInternalRow(Array[Any](words(i), words(i + 1)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BigramPairs =
    copy(child = newChild)
}
