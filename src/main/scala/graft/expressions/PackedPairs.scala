package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All unordered pairs from an `array<bigint>` of DISTINCT values, each
  * emitted exactly once as `struct(a, b)` with `a < b` — the candidate
  * enumeration kernel under `ngram_jaccard_pairs`' grouped-enumeration
  * design (one call per shingle group, k ≤ DfCap elements in, k(k−1)/2
  * pairs out).
  *
  * The built-in spelling — `flatten(transform(ids, a ->
  * transform(filter(ids, b -> b > a), b -> struct(a, b))))` — evaluates
  * the lambdas INTERPRETED and allocates a filtered ArrayData per outer
  * element: measured 3.1 s for 5.2M pairs at sf0.1, i.e. the hottest
  * loop of the whole dedup suite running on the expression interpreter.
  * This expression is one fused i<j loop with min/max orientation
  * (input order is irrelevant, so the upstream `sort_array` is gone
  * too), whole-stage-codegen'd.
  *
  * Output pair SET is identical to the built-in spelling on distinct
  * inputs; ORDER within the output array differs from the sorted-input
  * spelling, which no consumer observes (the array is exploded straight
  * into a commutative count aggregate).
  */
case class PackedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=false only: toLongArray would silently map null
    // elements to 0, violating the distinct-input contract without an
    // error. The collect_list producer already yields
    // containsNull=false, so well-formed plans are unaffected.
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "graft_pairs requires array<bigint> with containsNull=false " +
        "(null elements would silently read as 0); filter nulls or use " +
        "a non-null producer such as collect_list")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pairs requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pairs"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData].toLongArray()
    val n = xs.length
    PackedPairs.checkSizeJava(n)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs(i)
      var j = i + 1
      while (j < n) {
        val b = xs(j)
        if (a == b) PackedPairs.duplicateValueJava(a)
        out(k) =
          if (a < b) new GenericInternalRow(Array[Any](a, b))
          else new GenericInternalRow(Array[Any](b, a))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xs = ctx.freshName("xs")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val rowCls = classOf[GenericInternalRow].getName
      val arrCls = classOf[GenericArrayData].getName
      val exprCls = classOf[PackedPairs].getName
      s"""
         |long[] $xs = $c.toLongArray();
         |int $n = $xs.length;
         |$exprCls.checkSizeJava($n);
         |Object[] $out = new Object[$n * ($n - 1) / 2];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $a = $xs[$i];
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    long $b = $xs[$j];
         |    if ($a == $b) $exprCls.duplicateValueJava($a);
         |    $out[$k++] = ($a < $b)
         |      ? new $rowCls(new Object[]{$a, $b})
         |      : new $rowCls(new Object[]{$b, $a});
         |  }
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackedPairs =
    copy(child = newChild)
}

object PackedPairs {
  /** n(n−1)/2 must fit an int (and a JVM array): past this bound the
    * count computation itself overflows. Callers are expected to bound
    * group size far below it (ngram's DfCap = 100); the guard turns a
    * silent negative-size wrap into a diagnosable error. Called from
    * both the interpreted eval and the generated code (static
    * forwarder), so the two paths can't drift. */
  private val MaxElems = 46340 // floor(sqrt(2^31))

  def checkSizeJava(n: Int): Unit =
    if (n > MaxElems) throw new IllegalArgumentException(
      s"graft_pairs: input of $n elements would enumerate >Int.MaxValue pairs " +
        s"(bound $MaxElems); cap group fanout (e.g. a df-cap) before enumerating")

  /** Duplicate input values would emit degenerate (v,v) pairs, silently
    * violating the distinct-input a<b contract — abort instead. Every
    * duplicate necessarily meets its twin in the i<j scan, so the check
    * is complete at one predictable branch per pair; raised from both
    * eval paths (static forwarder) so they can't drift. */
  def duplicateValueJava(v: Long): Unit = throw new IllegalArgumentException(
    s"graft_pairs: duplicate value $v in input; values must be distinct")
}
