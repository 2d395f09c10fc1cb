package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Invariants of the embedding-space curation ops that the oracle hash
  * can't state directly: assignment bounds, the positive dedup path,
  * and the scale-critical plan shapes (cluster-keyed pair join, no
  * cartesian anywhere).
  */
class SemanticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("kmeans_assign: every vector lands in a cluster in [0, K)") {
    val rows = SparkEntry.queries("kmeans_assign")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Tables.embeddings(spark, Dir).count()
    assert(rows.length == n, "one assignment per input vector")
    assert(rows.forall { case (_, c, d) => c >= 0 && c < Semantic.K && d >= 0 })
    assert(rows.map(_._2).distinct.length > 1,
      "harness data must exercise more than one cluster")
  }

  test("semdedup_prune: every injected exact copy is pruned, originals survive") {
    val kept = SparkEntry.queries("semdedup_prune")(spark, Dir)
      .collect().map(_.getLong(0)).toSet
    val n = graft.Tables.embeddings(spark, Dir).count()
    // the corpus unions a +ReKeyA-id exact copy of every 7th vector; an
    // exact copy has cos = 1 >= tau against its earlier-id original in
    // the same cluster, so none may survive
    assert(!kept.exists(_ >= Dedup.ReKeyA), "all exact copies must be pruned")
    assert(kept.nonEmpty && kept.size <= n)
  }

  test("degenerate corpus smaller than K: fewer centroids, no fabricated ones") {
    // r14 padded the seed array to exactly K, fabricating null-c
    // centroid structs when the corpus had fewer vectors than K and
    // corrupting every distance (null d), diverging from the oracle's
    // LIMIT K. The driver-collected seeds take what exists: a 3-vector
    // corpus must yield assignments to at most 3 clusters, every
    // vector assigned, all distances non-null and ≥ 0.
    import org.apache.spark.sql.functions._
    val spark2 = spark
    val tiny = graft.Tables.embeddings(spark2, Dir)
      .orderBy("vec_id").limit(3)
    // drive the kmeans core through the public query path by staging
    // the tiny corpus as a parquet dir shaped like the harness layout
    val dir = java.nio.file.Files.createTempDirectory("graft-tinyk").toString
    tiny.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("kmeans_assign")(spark2, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3, "one assignment per vector")
    assert(rows.forall { case (_, c, d) => c >= 0 && c < 3 && d >= 0 },
      s"cluster ids within the 3 real seeds, distances non-null: ${rows.toSeq}")
  }

  test("semdedup pair search is cluster-keyed, never a cartesian") {
    val p = SparkEntry.queries("semdedup_prune")(spark, Dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("CartesianProduct"),
      s"no unconditioned all-pairs join anywhere in the plan:\n$p")
    // the pairwise prune runs inside the per-cluster kernel, fed by an
    // aggregate KEYED on the cluster id — candidates stay N²/K by plan
    // shape, never corpus-wide
    assert(p.contains("graft_semdedup_keep"),
      s"the prune must run in the fused per-cluster kernel:\n$p")
    val groupedOnCid = p.linesIterator.exists(l =>
      l.contains("Aggregate") && l.contains("keys=[cid#"))
    assert(groupedOnCid, s"the member grouping must key on the cluster id:\n$p")
  }
}
