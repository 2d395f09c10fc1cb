package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_inter_sorted(a, b)` — the number of DISTINCT values present
  * in BOTH arrays, for arrays the caller has ALREADY sorted ascending
  * (`sort_array` order: Spark's binary UTF8String ordering for
  * strings, natural for bigint). Result-identical to
  * `size(array_intersect(a, b))` on sorted inputs — the dedup verify
  * stages' hot scalar — but one allocation-free merge pass instead of
  * a per-row hash-set build plus a materialized intersection array the
  * caller only ever takes the size of. Duplicates in either input
  * count once and a null element present in both sides counts once
  * (array_intersect's set semantics; nulls sort FIRST, consumed as a
  * prefix); unsorted inputs are a CONTRACT VIOLATION and undercount
  * silently, which is why every call site pairs it with
  * `sort_array`/an already-ordered aggregate (InterSortedCountSpec
  * pins parity against array_intersect on random multisets, both
  * element types, nulls included).
  *
  * Why a kernel: the verify stage of the candidate-bounded dedup
  * family ([[graft.operators.Dedup]] X90/X131/X137/X142) evaluates
  * this once per candidate pair over ~10²-element shingle/signature
  * sets — at 100 TB that is the dominant row-local CPU of the whole
  * family (the sfx1 decade measured the prefix-join wall 15× for 10×
  * rows on exactly this scalar), and it codegens into the enclosing
  * stage with zero per-row allocation.
  */
case class InterSortedCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(LongType, _) => Some(LongType)
    case ArrayType(StringType, _) => Some(StringType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined &&
        elem(left.dataType) == elem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_inter_sorted requires two arrays of the SAME element type " +
        "(array<bigint> or array<string>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private lazy val isString =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  // `sort_array` ascending places NULL elements FIRST — the merge
  // consumes that prefix up front (a null present in both sides counts
  // once, array_intersect's null-matches-null semantics), so the hot
  // loop below needs no per-element null checks.

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_inter_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0
    while (i < nx && x.isNullAt(i)) i += 1
    while (j < ny && y.isNullAt(j)) j += 1
    var c = if (i > 0 && j > 0) 1L else 0L
    if (isString) {
      while (i < nx && j < ny) {
        val xv = x.getUTF8String(i); val yv = y.getUTF8String(j)
        val cmp = xv.compareTo(yv)
        if (cmp < 0) i += 1
        else if (cmp > 0) j += 1
        else {
          c += 1
          i += 1; while (i < nx && x.getUTF8String(i).equals(xv)) i += 1
          j += 1; while (j < ny && y.getUTF8String(j).equals(yv)) j += 1
        }
      }
    } else {
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else {
          c += 1
          i += 1; while (i < nx && x.getLong(i) == xv) i += 1
          j += 1; while (j < ny && y.getLong(j) == yv) j += 1
        }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val cmp = ctx.freshName("cmp")
      val nullPrefix =
        s"""
           |int $nx = $a.numElements(); int $ny = $b.numElements();
           |int $i = 0; int $j = 0;
           |while ($i < $nx && $a.isNullAt($i)) { $i++; }
           |while ($j < $ny && $b.isNullAt($j)) { $j++; }
           |long $c = ($i > 0 && $j > 0) ? 1L : 0L;
         """.stripMargin
      if (isString) {
        val u = classOf[UTF8String].getName
        s"""
           |$nullPrefix
           |while ($i < $nx && $j < $ny) {
           |  $u $xv = $a.getUTF8String($i);
           |  $u $yv = $b.getUTF8String($j);
           |  int $cmp = $xv.compareTo($yv);
           |  if ($cmp < 0) { $i++; }
           |  else if ($cmp > 0) { $j++; }
           |  else {
           |    $c++;
           |    $i++; while ($i < $nx && $a.getUTF8String($i).equals($xv)) { $i++; }
           |    $j++; while ($j < $ny && $b.getUTF8String($j).equals($yv)) { $j++; }
           |  }
           |}
           |${ev.value} = $c;
         """.stripMargin
      } else {
        s"""
           |$nullPrefix
           |while ($i < $nx && $j < $ny) {
           |  long $xv = $a.getLong($i);
           |  long $yv = $b.getLong($j);
           |  if ($xv < $yv) { $i++; }
           |  else if ($xv > $yv) { $j++; }
           |  else {
           |    $c++;
           |    $i++; while ($i < $nx && $a.getLong($i) == $xv) { $i++; }
           |    $j++; while ($j < $ny && $b.getLong($j) == $yv) { $j++; }
           |  }
           |}
           |${ev.value} = $c;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterSortedCount =
    copy(left = newLeft, right = newRight)
}
