package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-cluster SemDeDup prune in ONE pass (Abbas et al. 2023,
  * arXiv:2303.09540): given a cluster's members as
  * `array<struct<vec_id bigint, qu array<bigint>, nrm bigint>>`,
  * return the ascending vec_ids that SURVIVE pruning — a member is
  * dropped iff ANY earlier-id member of the same cluster (dropped or
  * not, exactly like the pair-join spelling) has cosine ≥ τ with it.
  *
  * The τ = 0.9 test is the same exact integer comparison the join
  * spelling ran per candidate pair: dot > 0 and
  * (10·dot)² ≥ (9·|a|²)·(9·|b|²) in 128-bit arithmetic
  * ([[MulGe.compute]] — shared, so the two spellings cannot diverge).
  *
  * Why a kernel instead of the self-join + anti-join: the pairwise
  * work is IDENTICAL (cluster-bounded, N²/K candidates — the kernel
  * even does less via the per-member early exit), but the relational
  * spelling costs two shuffles and ~5 adaptive query stages whose
  * per-stage driver re-planning dominated the measured wall time at
  * small scale. Here the whole prune is: one hash aggregate keyed by
  * cid (map-side combinable collect_list) → this projection → done.
  *
  * Memory contract: one cluster's vectors are materialized per group
  * (m·Dim longs). That is the SemDeDup design point — K grows with the
  * corpus precisely so cluster sizes stay bounded (50k clusters for
  * LAION in the paper) — and the same bound the join spelling's
  * per-key hash build already implied. Inputs are materialized into
  * primitive arrays once, so the O(m²/2·Dim) inner loop runs on flat
  * longs, not ArrayData accessors.
  *
  * Evaluated once per CLUSTER (K rows per query), so codegen would buy
  * nothing: CodegenFallback is deliberate.
  */
case class SemDedupKeep(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // containsNull = false required (like graft_pairs): the internal
  // collect_list feed never emits null elements and declares exactly
  // that, while an ad-hoc SQL array(...) with a null member would NPE
  // in the struct reads below — reject it at analysis instead
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(a, b, c)), false) =>
      a.dataType == LongType &&
        b.dataType.isInstanceOf[ArrayType] &&
        b.dataType.asInstanceOf[ArrayType].elementType == LongType &&
        c.dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_semdedup_keep requires array<struct<bigint, array<bigint>, bigint>> " +
        "with containsNull=false, got " + child.dataType.simpleString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_semdedup_keep"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val qus = new Array[Array[Long]](m)
    val nrms = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 3)
      // nullable STRUCT FIELDS pass the type check (the internal
      // struct(col…) feed is nullable-typed though never null-valued);
      // a null value here is a caller contract violation — fail loudly
      // instead of NPE-ing inside the pairwise loop
      if (row == null || row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2))
        throw new IllegalArgumentException(
          s"graft_semdedup_keep: null member or null vec_id/qu/nrm field at index $i")
      ids(i) = row.getLong(0)
      // the qu element type is nullable in most feeds (transform()
      // and test-harness encoders both type it containsNull=true even
      // though no null is ever produced), so the inner-null contract
      // is enforced HERE, loudly, instead of NPE-ing in toLongArray —
      // an O(dim) scan that is noise next to the O(m²·dim) loop below
      val qarr = row.getArray(1)
      val dim = qarr.numElements()
      val q = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        if (qarr.isNullAt(j))
          throw new IllegalArgumentException(
            s"graft_semdedup_keep: null vector element at member $i dim $j")
        q(j) = qarr.getLong(j)
        j += 1
      }
      qus(i) = q
      nrms(i) = row.getLong(2)
      i += 1
    }
    // ascending vec_id defines "earlier": collect_list order is
    // arbitrary, so sort an index permutation here (deterministic
    // regardless of shuffle arrival order; vec_ids are distinct)
    val order = (0 until m).sortBy(ids(_)).toArray
    val kept = Array.newBuilder[Long]
    var jj = 0
    while (jj < m) {
      val j = order(jj)
      val qj = qus(j)
      var ii = 0
      var drop = false
      while (ii < jj && !drop) {
        val a = order(ii)
        val qa = qus(a)
        val n = math.min(qa.length, qj.length)
        var dot = 0L
        var k = 0
        while (k < n) { dot += qa(k) * qj(k); k += 1 }
        if (dot > 0 && MulGe.compute(10L * dot, 10L * dot, 9L * nrms(a), 9L * nrms(j)))
          drop = true
        ii += 1
      }
      if (!drop) kept += ids(j)
      jj += 1
    }
    new GenericArrayData(kept.result())
  }

  override protected def withNewChildInternal(newChild: Expression): SemDedupKeep =
    copy(child = newChild)
}
