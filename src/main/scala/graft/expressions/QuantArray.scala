package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused embedding quantizer: `graft_quant(vec, scale, shift)` over
  * `array<float|double>` → `array<bigint>` with element
  * `CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT) + shift` — the
  * exact-integer quantization step under the [[graft.operators.Semantic]]
  * k-means/SemDeDup family.
  *
  * The `transform(vec, x -> ...)` spelling evaluates its lambda on the
  * expression interpreter — Dim reflective tree walks and a boxed long
  * per element, per row, and the k-means core quantizes the corpus on
  * every round's row path. This kernel is one codegen'd JVM loop.
  *
  * Bit-identical to the lambda spelling and the DuckDB oracle's
  * `list_transform`: float→double widening is exact, the multiply is
  * the same correctly-rounded IEEE op, floor is exact, and the
  * long cast of an integral double ≤ 2^53 is exact. ANSI parity: a
  * non-finite or out-of-long-range element throws (the lambda's ANSI
  * CAST would), rather than silently wrapping. Null array → null; null
  * elements abort loudly (embeddings are dense by contract).
  */
case class QuantArray(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _)
      if second.foldable && second.dataType == LongType &&
         third.foldable && third.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_quant requires (array<float|double>, bigint literal, bigint literal), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_quant"

  private lazy val isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val scaleV: Long = second.eval().asInstanceOf[Long]
  private lazy val shiftV: Long = third.eval().asInstanceOf[Long]

  override def nullSafeEval(arr: Any, s: Any, sh: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      QuantArray.compute(arr.asInstanceOf[ArrayData], isFloat, scaleV, shiftV))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val kernel = QuantArray.getClass.getName.stripSuffix("$")
      val arrCls = classOf[UnsafeArrayData].getName
      s"${ev.value} = $arrCls.fromPrimitiveArray(" +
        s"$kernel.compute($a, $isFloat, ${scaleV}L, ${shiftV}L));"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QuantArray =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object QuantArray {
  /** The fused loop; static so generated and interpreted eval share one
    * implementation (WindowHash precedent). */
  def compute(arr: ArrayData, isFloat: Boolean, scale: Long, shift: Long): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val f = Math.floor(x * scale)
      // ANSI CAST parity: reject what CAST(double AS BIGINT) would
      if (f.isNaN || f < Long.MinValue.toDouble || f > Long.MaxValue.toDouble)
        throw new ArithmeticException(s"graft_quant: value $x out of BIGINT range after scaling")
      out(i) = f.toLong + shift
      i += 1
    }
    out
  }
}
