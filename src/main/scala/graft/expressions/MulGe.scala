package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Exact 128-bit product comparison for NON-NEGATIVE longs:
  * `graft_mulge(a, b, c, d)` ⇔ `a·b ≥ c·d` with both products computed
  * in full 128-bit integer precision — the overflow-free spelling of
  * cross-multiplied rational threshold tests (cosine τ², BM25-style
  * ratios) whose products exceed 2^63.
  *
  * The column-algebra spelling casts through `decimal(38,0)`: three
  * Int128/BigDecimal multiplications and a comparison through Spark's
  * Decimal wrapper per row — the dominant per-pair cost in the
  * SemDeDup candidate filter (millions of candidate pairs). This
  * kernel is two `Math.multiplyHigh` products and a branch, fully
  * inside whole-stage codegen.
  *
  * Exactness: for operands in [0, 2^63), the signed 128-bit product
  * (`multiplyHigh` high word + wrapped low word) IS the unsigned
  * product — no wrap is possible below 2^126 — so comparing (hi
  * signed, lo unsigned) lexicographically is the exact integer test,
  * bit-identical to the decimal spelling and the oracle's HUGEINT.
  * NEGATIVE operands are a contract violation and throw loudly
  * (callers here feed norms and guarded-positive dots; silently
  * wrapping a sign would corrupt a threshold test).
  * Any null operand → null, matching the decimal spelling.
  */
case class MulGe(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mulge requires four BIGINT arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_mulge"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    MulGe.compute(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val kernel = MulGe.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.compute($a, $b, $c, $d);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): MulGe =
    copy(newFirst, newSecond, newThird, newFourth)
}

object MulGe {
  /** a·b ≥ c·d exactly, for a,b,c,d ∈ [0, 2^63). Static so generated
    * and interpreted eval share one implementation. */
  def compute(a: Long, b: Long, c: Long, d: Long): Boolean = {
    if ((a | b | c | d) < 0) throw new ArithmeticException(
      s"graft_mulge requires non-negative operands, got ($a, $b, $c, $d)")
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2 else java.lang.Long.compareUnsigned(lo1, lo2) >= 0
  }
}
