package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two `array<double>` columns.
  *
  * The built-in spelling — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D,
  * (acc,x) -> acc+x)` — materializes an intermediate array and evaluates
  * the lambdas interpreted, per element, outside whole-stage codegen.
  * This expression generates a tight fused loop instead (and is the hot
  * kernel under every similarity query: top-k, LSH bucketing, near-dup
  * cosine).
  *
  * Semantics: left-to-right accumulation — BIT-IDENTICAL to the
  * built-in fold and to DuckDB's `list_reduce` equivalent, so swapping
  * it in does not move any oracle-checked double by even an ulp.
  * Unequal lengths use the common prefix; null array → null. (Inputs
  * here are fixed-width embedding vectors; both caveats are theoretical.)
  *
  * Exposed as SQL function `graft_dot` via [[GraftExtensions]]
  * (`SparkSessionExtensions.injectFunction`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Engine extensions, installed with
  * `spark.sql.extensions=graft.GraftExtensions` (see [[graft.Sessions]]).
  * The injection point Spark provides for exactly this: custom
  * expressions/rules/strategies without forking the session builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_doti"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_doti"),
      (children: Seq[Expression]) => DotProductLong(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashVotes].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashVotes(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKByCount].getName, "graft_topk"),
      (children: Seq[Expression]) => TopKByCount(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pairs"),
      new ExpressionInfo(classOf[PackedPairs].getName, "graft_pairs"),
      (children: Seq[Expression]) => PackedPairs(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_winhash"),
      new ExpressionInfo(classOf[WindowHash].getName, "graft_winhash"),
      (children: Seq[Expression]) => WindowHash(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_train"),
      new ExpressionInfo(classOf[BpeTrain].getName, "graft_bpe_train"),
      (children: Seq[Expression]) => BpeTrain(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSig(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_repstats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_repstats"),
      (children: Seq[Expression]) => RepStats(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_quant"),
      new ExpressionInfo(classOf[QuantArray].getName, "graft_quant"),
      (children: Seq[Expression]) => QuantArray(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_semdedup_keep"),
      new ExpressionInfo(classOf[SemDedupKeep].getName, "graft_semdedup_keep"),
      (children: Seq[Expression]) => SemDedupKeep(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_mulge"),
      new ExpressionInfo(classOf[MulGe].getName, "graft_mulge"),
      (children: Seq[Expression]) =>
        MulGe(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk_min"),
      new ExpressionInfo(classOf[TopKMin].getName, "graft_topk_min"),
      (children: Seq[Expression]) => TopKMin(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_set_cap"),
      new ExpressionInfo(classOf[CappedSet].getName, "graft_set_cap"),
      (children: Seq[Expression]) => CappedSet(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_mmr"),
      new ExpressionInfo(classOf[MmrSelect].getName, "graft_mmr"),
      (children: Seq[Expression]) => MmrSelect(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bigrams"),
      new ExpressionInfo(classOf[BigramPairs].getName, "graft_bigrams"),
      (children: Seq[Expression]) => BigramPairs(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_looprun"),
      new ExpressionInfo(classOf[LoopRun].getName, "graft_looprun"),
      (children: Seq[Expression]) => LoopRun(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_inter_sorted"),
      new ExpressionInfo(classOf[InterSortedCount].getName, "graft_inter_sorted"),
      (children: Seq[Expression]) => InterSortedCount(children.head, children(1))))
  }
}
