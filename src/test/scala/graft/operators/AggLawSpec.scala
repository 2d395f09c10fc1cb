package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-row consistency laws the per-row oracle hash can't state:
  * cube margins must re-aggregate their detail cells, and the snapshot
  * diff must classify exactly the synthesized changes.
  */
class AggLawSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("cube margins re-aggregate the detail cells exactly") {
    val rows = Olap.cubeAgg(spark, dir).collect()
    def cell(l: String, s: String) =
      rows.find(r => r.getString(0) == l && r.getString(1) == s).get
    val detail = rows.filter(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")
    // grand total == sum of detail
    assert(cell("(all)", "(all)").getAs[Long]("n_docs") ===
      detail.map(_.getAs[Long]("n_docs")).sum)
    assert(cell("(all)", "(all)").getAs[Long]("chars") ===
      detail.map(_.getAs[Long]("chars")).sum)
    // each lang marginal == sum of its detail rows
    detail.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(cell(lang, "(all)").getAs[Long]("n_docs") ===
        rs.map(_.getAs[Long]("n_docs")).sum, s"lang=$lang")
    }
    // each source marginal == sum of its detail rows
    detail.groupBy(_.getString(1)).foreach { case (src, rs) =>
      assert(cell("(all)", src).getAs[Long]("n_docs") ===
        rs.map(_.getAs[Long]("n_docs")).sum, s"source=$src")
    }
  }

  test("snapshot_diff classifies exactly the synthesized changes, disjointly") {
    val rows = Relational.snapshotDiff(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // statuses are a partition: one classification per doc_id
    assert(rows.map(_._1).distinct.length === rows.length)
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val ids = graft.Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // removed: multiples of 7 that were not re-keyed away
    val removed = ids.filter(_ % 7 == 0)
    // added: re-keyed survivors (every 10th, not dropped by the %7 rule)
    val added = ids.filter(id => id % 7 != 0 && id % 10 == 0).map(_ + Dedup.ReKeyB)
    // changed: edited survivors that kept their key
    val changed = ids.filter(id => id % 7 != 0 && id % 10 != 0 && id % 4 == 0)
    assert(byStatus.getOrElse("removed", Set.empty) ===
      removed ++ ids.filter(id => id % 7 != 0 && id % 10 == 0))
    assert(byStatus.getOrElse("added", Set.empty) === added)
    assert(byStatus.getOrElse("changed", Set.empty) === changed)
  }
}
