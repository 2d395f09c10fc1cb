package graft

/** Measures the SESSION-STAGE design's payoff — the number the main
  * bench deliberately cannot show. `graft.Bench` wipes cache and
  * persisted RDDs between queries so every measurement is isolated and
  * honest; that also re-prices the [[Tables.stage]] relations per
  * query, hiding the multi-query operating mode they exist for (a
  * campaign materializes its signature/stage tables once and every
  * downstream query rides them — docs/SCALE.md).
  *
  * This main runs the staged-signature family BOTH ways, interleaved
  * in one JVM (the measurement discipline): ISOLATED = wipe between
  * queries (each re-pays the shingle→signature chain, the per-query
  * bench semantics) vs CAMPAIGN = one session, no wipes (the first
  * consumer builds the stage, the rest ride it). Emits ONE JSON line
  * and writes `CAMPAIGN_BENCH.json` when run from the repo root at the
  * canonical sf0.1.
  */
object CampaignBench {
  /** The consumers of the session-staged MinHash signature relation
    * (`Dedup.stagedSig`) plus the CC-label inheritors — the family a
    * dedup campaign actually runs as one session. */
  private val Family = Seq(
    "minhash_lsh_candidates", "minhash_jaccard_estimate", "lsh_band_recall",
    "near_dup_cluster", "dedup_resolve", "dedup_rate_report",
    // r17: the candidate-graph centrality rides the same stage table
    "dup_graph_pagerank",
    // r18: the verify-threshold sweep rides it too (signatures +
    // candidate pairs both come from the staged relation)
    "dedup_threshold_sweep",
    // r19: bitext mining rides the same staged candidates (lang attach
    // is the only work past the shared pair relation)
    "parallel_pair_mine",
    // r19: the triangle census enumerates wedges over the same staged
    // candidate relation
    "dup_triangle_audit")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.get("graft-campaign-bench")
    Tables.names.foreach(n =>
      try Tables.table(spark, sfDir, n).count()
      catch { case scala.util.control.NonFatal(_) => () })

    def wipe(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up pass (uncounted): JIT + codegen cache
    Family.foreach { q => runOne(q); wipe() }

    val iso = scala.collection.mutable.Map.empty[String, List[Double]]
    val camp = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to rounds) {
      // ISOLATED: wipe between queries (per-query bench semantics)
      Family.foreach { q =>
        iso(q) = runOne(q) :: iso.getOrElse(q, Nil); wipe()
      }
      // CAMPAIGN: one session epoch, no wipes — first consumer builds
      // the stage table, the rest ride it; wipe only at epoch end
      Family.foreach { q => camp(q) = runOne(q) :: camp.getOrElse(q, Nil) }
      wipe()
    }
    def min(m: collection.Map[String, List[Double]], q: String) = m(q).min
    val isoTotal = Family.map(min(iso, _)).sum
    val campTotal = Family.map(min(camp, _)).sum
    val qs = Family.map(q =>
      f""""$q":{"isolated":${min(iso, q)}%.3f,"campaign":${min(camp, q)}%.3f}""")
      .mkString("{", ",", "}")
    val line =
      f"""{"metric":"campaign_vs_isolated","isolated_sec":$isoTotal%.3f,"campaign_sec":$campTotal%.3f,"saving_pct":${100 * (isoTotal - campTotal) / isoTotal}%.1f,"rounds":$rounds,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    System.err.println(line)
    val canonical =
      try java.nio.file.Paths.get(sfDir).toRealPath() ==
        java.nio.file.Paths.get("/root/testdata/sf0.1").toRealPath()
      catch { case scala.util.control.NonFatal(_) => sfDir == "/root/testdata/sf0.1" }
    if (canonical && java.nio.file.Files.exists(java.nio.file.Paths.get("build.sbt")))
      java.nio.file.Files.write(java.nio.file.Paths.get("CAMPAIGN_BENCH.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
