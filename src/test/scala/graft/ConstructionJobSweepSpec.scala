package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide scale guard #3: building a query's DataFrame must be
  * LAZY — a `collect`/`count`/eager checkpoint inside a query function
  * runs corpus-scale jobs at CONSTRUCTION time, before the caller ever
  * asks for rows, and is also how driver-side loops over data sneak
  * in. The sweep counts Spark jobs started while each registry entry
  * is constructed (no action invoked).
  *
  * Documented eager constructions are allowlisted by name with their
  * justification; anything else that starts a job at build time fails.
  * The allowance is `>= 0` jobs but NO LIMIT for listed queries —
  * their loops are iteration-count-bounded by operator semantics, and
  * pinning exact job counts would couple the spec to AQE internals.
  */
class ConstructionJobSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  /** Queries whose CONSTRUCTION legitimately runs jobs:
    *  - the CC family (`near_dup_cluster`, `dedup_resolve`,
    *    `corpus_pipeline`, `pipeline_layout`, `corpus_chunk_dedup` via
    *    shared stages): the label loop materializes each round
    *    (checkpoint lineage cut) and its round count is data-dependent
    *    — the loop must run to know the fixpoint;
    *  - `bpe_train_merges` / `bpe_encode` / `vocab_coverage` /
    *    `sequence_pack`-composed pipelines that embed the trained
    *    artifact: the merge loop picks each round's best pair with a
    *    bounded TakeOrdered action (rounds = NumMerges, a constant);
    *  - `ann_ivf_topk`: the IVF "training step" — one scalar count to
    *    derive the centroid stride (every real IVF build runs it);
    *  - `kmeans_assign` / `semdedup_prune`: the Lloyd loop collects
    *    K·Dim centroid longs per round (MLlib's own KMeans shape) —
    *    rounds = Iters, a constant; per-round state is KiB-sized at any
    *    corpus size;
    *  - `minhash_*`/`ann_lsh_*`/`semdedup_prune`/`exact_substr_*`:
    *    stage/signature relations localCheckpoint or persist eagerly
    *    so one materialization is shared across consumers.
    */
  private val EagerByDesign: Set[String] = Set(
    "near_dup_cluster", "dedup_resolve", "corpus_pipeline",
    "pipeline_layout", "corpus_chunk_dedup",
    "bpe_train_merges", "bpe_encode", "vocab_coverage",
    "ann_ivf_topk", "kmeans_assign",
    "minhash_lsh_candidates", "minhash_jaccard_estimate",
    "ann_lsh_bucket_top1", "semdedup_prune", "ngram_jaccard_pairs",
    "exact_substr_spans", "exact_substr_cut",
    // the CC label loop again, through the rate rollup (X69 rides the
    // same staged signature + checkpointed fixpoint as near_dup_cluster)
    "dedup_rate_report",
    // X70/X72: the PQ codebooks train through the same driver-collected
    // Lloyd rounds as kmeans_assign (seed draw + one fused update
    // aggregate at construction; state M·K·SubDim longs, O(1) in corpus)
    "pq_adc_topk", "pq_recall_report",
    // X74: the shared k-means core's driver-collected Lloyd rounds
    // (seed draw + centroid update collects; state K·Dim longs, O(1)
    // in corpus) run at construction, same as kmeans_assign
    "cluster_balanced_sample",
    // X76: rides the session-staged minhash signature relation (the
    // dedup family's stage table materializes with its first consumer)
    "dup_graph_pagerank",
    // X81: the IVF training step again — one scalar count derives the
    // centroid stride, same as ann_ivf_topk
    "ivf_nprobe_recall",
    // X101: the CC label loop a third time, through the quality×dup
    // contingency (rides clusterLabels' checkpointed fixpoint exactly
    // like near_dup_cluster / dedup_rate_report above)
    "quality_dup_lift",
    // X111: the candidate-pair lineage cut (r21) — the wedge
    // enumeration references the pair relation four ways, and the
    // uncut plan embedded the minhash chain 14×; one eager
    // localCheckpoint shares a single materialization (the
    // dup_graph_pagerank discipline, measurement at its definition)
    "dup_triangle_audit")

  test("query construction is lazy (no jobs before the first action)") {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    def drain(): Unit = org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
    // Warm the per-session reader memo first: the FIRST access to each
    // table runs its one FileIndex/schema job (Tables.table scaladoc) —
    // a once-per-session catalog cost, not a per-query eagerness bug.
    Tables.names.foreach(n => Tables.table(spark, Dir, n))
    drain()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      drain()
      jobs.set(0)
      // Cleanup is the BLANKET clearCache + unpersist-all, deliberately:
      // suites run SEQUENTIALLY in the forked test JVM (Test/fork with
      // sbt's default testForkedParallel=false) and tests run
      // sequentially within a suite, so nothing concurrent can lose its
      // cache mid-use — completed suites don't re-read theirs, and
      // later suites haven't built theirs yet (Tables.stage re-persists
      // on next access by design). The once-considered scoped
      // alternative — unpersist only the RDD ids this construction
      // added — is WORSE: force-unpersisting a cached RDD leaves its
      // CacheManager entry registered, so any later identical plan is
      // served an entry that recomputes on every read and never
      // re-caches (Dataset.storageLevel reports the entry's requested
      // level, defeating the `== NONE` re-persist guard), and persists
      // registered but not yet materialized are invisible to the id
      // diff entirely. clearCache() drops the ENTRIES, which is the
      // state that must not leak.
      spark.sparkContext.addSparkListener(listener)
      try {
        fn(spark, Dir) // construct ONLY — no action
        drain()
        val n = jobs.get()
        if (n > 0 && !EagerByDesign.contains(name))
          Seq(s"$name: $n job(s) at construction")
        else Nil
      } finally {
        spark.sparkContext.removeSparkListener(listener)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }
    assert(offenders.isEmpty,
      "\nQueries running Spark jobs at CONSTRUCTION time (eager action in the" +
        " query path):\n  " + offenders.distinct.mkString("\n  ") +
        "\n  Make the plan lazy, or — for a bounded training/fixpoint loop —" +
        " add the query to EagerByDesign with its justification.")
  }
}
