package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The compaction plan's bin-packing laws against the manifest it
  * consumes: groups partition the file list contiguously in z-order
  * (no file lost, none split, no overlap), row totals are conserved,
  * every non-final group lands within one source file of the target,
  * and the z-ranges stay monotone so the rewrite preserves clustering. */
class CompactionPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val RowsPerFile = 64L
  private val Target = 4 * RowsPerFile

  test("groups partition the manifest contiguously and conserve rows") {
    val manifest = SparkEntry.queries("zorder_layout")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq // (file_id, n_rows)
    val plan = SparkEntry.queries("compaction_plan")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sortBy(_._1)
    assert(plan.nonEmpty)
    // contiguous cover: group g's file span starts where g-1 ended
    assert(plan.head._4 == manifest.map(_._1).min)
    assert(plan.last._5 == manifest.map(_._1).max)
    plan.sliding(2).foreach {
      case Seq(a, b) => assert(b._4 == a._5 + 1,
        s"gap/overlap between groups ${a._1} and ${b._1}")
      case _ => ()
    }
    // n_files matches the span, rows conserved per group and in total
    val byFile = manifest.toMap
    plan.foreach { case (g, nFiles, nRows, fMin, fMax, _, _) =>
      assert(nFiles == fMax - fMin + 1, s"group $g files != span")
      assert(nRows == (fMin to fMax).map(byFile).sum, s"group $g rows not conserved")
    }
    assert(plan.map(_._3).sum == manifest.map(_._2).sum)
    // packing bound: every non-final group is within one file of target
    plan.init.foreach { case (g, _, nRows, _, _, _, _) =>
      assert(nRows >= Target - (RowsPerFile - 1) && nRows <= Target + RowsPerFile - 1,
        s"group $g rows=$nRows outside the one-file band around $Target")
    }
    // clustering preserved: z-ranges non-decreasing across groups
    plan.sliding(2).foreach {
      case Seq(a, b) => assert(b._6 >= a._6 && b._7 >= a._7,
        s"z-order broken between groups ${a._1} and ${b._1}")
      case _ => ()
    }
  }
}
