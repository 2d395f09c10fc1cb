package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Maximal consecutive repeat run of any n-gram: `graft_looprun(w, n)`
  * over a token array returns the largest m such that some n-token
  * window repeats m times BACK TO BACK (stride n) — the degenerate-
  * text signature ("the cat the cat the cat …") that loops an LM's
  * sampling and that repetition RATIOS ([[RepStats]]) under-weigh when
  * the loop is long but the doc is longer. Returns 1 when the doc has
  * ≥ 1 window but no consecutive repeat, 0 when it has no window at
  * all (fewer than n tokens).
  *
  * Definition via the engine's portable window hash
  * ([[WindowHash.compute]] — md5-60-bit per position, the h60 chain):
  * a chain at position i is h[i] = h[i+n] = h[i+2n] = …, and the
  * result is 1 + the longest such chain, maximized over start
  * positions. Gram equality ↔ hash equality modulo the family's
  * documented ~2⁻⁶⁰ collision trade (a collision could only
  * overstate a run). One fused JVM loop per row — O(windows) time,
  * O(n) run-state — invoked from whole-stage-codegen'd code; the
  * DuckDB oracle spells the identical definition relationally
  * (per-position hashes, stride-n islands, max count).
  */
case class LoopRun(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val n = right.eval()
      if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_looprun window size must be a positive literal, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_looprun requires (array<string>, int literal), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_looprun"

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(arr: Any, nIgnored: Any): Any =
    LoopRun.compute(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val kernel = LoopRun.getClass.getName.stripSuffix("$")
      s"${ev.value} = $kernel.compute($a, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LoopRun =
    copy(left = newLeft, right = newRight)
}

object LoopRun {
  /** The fused loop; static so generated and interpreted paths share it. */
  def compute(arr: ArrayData, n: Int): Long = {
    val hs = WindowHash.compute(arr, n)
    val m = hs.length
    if (m == 0) return 0L
    // runs(r) = length of the live stride-n equal chain ending at the
    // previous position of residue class r
    val runs = new Array[Long](n)
    var best = 0L
    var i = n
    while (i < m) {
      val r = i % n
      runs(r) = if (hs(i) == hs(i - n)) runs(r) + 1 else 0L
      if (runs(r) > best) best = runs(r)
      i += 1
    }
    best + 1
  }
}
