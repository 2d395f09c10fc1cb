package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal-Marginal-Relevance selection over ONE query's candidate
  * pool (Carbonell & Goldstein 1998): `graft_mmr(cands, k, lp)` with
  * `cands: array<struct<id bigint, simq bigint, emb array<bigint>>>`
  * returns up to `k` candidate ids IN SELECTION ORDER, greedily
  * maximizing
  *
  *   score(c) = lp · simq(c) − (1000 − lp) · max_{s ∈ selected} dot(c, s)
  *
  * with `lp` the relevance weight in permille (0 < lp ≤ 1000), the
  * max-term 0 while nothing is selected (step 1 = pure relevance), and
  * ties broken to the smaller id — a deterministic total order both
  * engines share, so the k-step greedy is reproducible exactly in the
  * DuckDB oracle's unrolled-step SQL. All arithmetic is exact int64:
  * quantized embeddings (±4·10³ per component at the caller's 10³
  * scale, ≤ 64 dims) keep every dot below 10⁹ and every score below
  * 10¹² — five orders under overflow.
  *
  * Why a kernel: the greedy is inherently sequential in k, but each
  * query's pool is BOUNDED (the caller's top-K0 heap), so the right
  * distributed shape is "collect the bounded pool per query, run the
  * O(k·K0·Dim) loop row-locally" — one hash aggregate + this
  * projection, versus k relational rounds (k joins + k windows) whose
  * per-stage scheduling would dominate at any scale. Evaluated once
  * per QUERY row, so codegen would buy nothing: CodegenFallback is
  * deliberate (the SemDedupKeep precedent).
  */
case class MmrSelect(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(a, b, c)), false) =>
      a.dataType == LongType && b.dataType == LongType &&
        c.dataType.isInstanceOf[ArrayType] &&
        c.dataType.asInstanceOf[ArrayType].elementType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(first.dataType) &&
        second.foldable && second.dataType == IntegerType &&
        third.foldable && third.dataType == IntegerType) {
      // both args are foldable ints, so their VALUES are evaluable here:
      // reject a null/out-of-range k or lambda at analysis time instead
      // of as an opaque lazy-init task failure on an executor
      val kVal = second.eval()
      val lpVal = third.eval()
      if (kVal == null || kVal.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"graft_mmr: k must be a non-null int literal >= 1, got $kVal")
      else if (lpVal == null ||
          lpVal.asInstanceOf[Int] <= 0 || lpVal.asInstanceOf[Int] > 1000)
        TypeCheckResult.TypeCheckFailure(
          s"graft_mmr: lambda_permille must be a non-null int literal in (0, 1000], got $lpVal")
      else TypeCheckResult.TypeCheckSuccess
    } else TypeCheckResult.TypeCheckFailure(
      "graft_mmr requires (array<struct<bigint, bigint, array<bigint>>> " +
        "with containsNull=false, int literal k, int literal lambda_permille), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_mmr"

  private lazy val kV: Int = second.eval().asInstanceOf[Int]
  private lazy val lpV: Long = {
    val v = third.eval().asInstanceOf[Int].toLong
    require(v > 0 && v <= 1000, s"graft_mmr: lambda_permille must be in (0, 1000], got $v")
    v
  }

  override def nullSafeEval(input: Any, kIn: Any, lpIn: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val simq = new Array[Long](m)
    val embs = new Array[Array[Long]](m)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 3)
      if (row == null || row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2))
        throw new IllegalArgumentException(
          s"graft_mmr: null member or null id/simq/emb field at index $i")
      ids(i) = row.getLong(0)
      simq(i) = row.getLong(1)
      val e = row.getArray(2)
      val dim = e.numElements()
      val q = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        if (e.isNullAt(j)) throw new IllegalArgumentException(
          s"graft_mmr: null embedding element at member $i dim $j")
        q(j) = e.getLong(j)
        j += 1
      }
      embs(i) = q
      i += 1
    }
    val lm = 1000L - lpV
    val selected = new Array[Boolean](m)
    // running max-sim-to-selected per candidate: updated incrementally
    // after each pick, so the loop is O(k·K0·Dim) not O(k²·K0·Dim)
    val maxSim = Array.fill(m)(Long.MinValue) // MinValue = "nothing selected yet"
    val out = Array.newBuilder[Long]
    val take = math.min(kV, m)
    var step = 0
    while (step < take) {
      var best = -1
      var bestScore = Long.MinValue
      var c = 0
      while (c < m) {
        if (!selected(c)) {
          val penalty = if (maxSim(c) == Long.MinValue) 0L else maxSim(c)
          val score = lpV * simq(c) - lm * penalty
          if (best == -1 || score > bestScore ||
              (score == bestScore && ids(c) < ids(best))) {
            best = c
            bestScore = score
          }
        }
        c += 1
      }
      selected(best) = true
      out += ids(best)
      // fold the new pick into every unselected candidate's max term
      val eb = embs(best)
      c = 0
      while (c < m) {
        if (!selected(c)) {
          val ec = embs(c)
          val n = math.min(eb.length, ec.length)
          var dot = 0L
          var j = 0
          while (j < n) { dot += eb(j) * ec(j); j += 1 }
          if (maxSim(c) == Long.MinValue || dot > maxSim(c)) maxSim(c) = dot
        }
        c += 1
      }
      step += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MmrSelect =
    copy(first = newFirst, second = newSecond, third = newThird)
}
