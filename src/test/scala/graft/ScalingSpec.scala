package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Empirical scaling evidence for the dedup family — the round-6 ask
  * that plan reading alone can't answer: do shuffle volumes actually
  * grow sub-quadratically when the corpus grows 10×?
  *
  * `documents` has 500 rows at sf0.01 and 5,000 at sf0.1 (sf0.001 is
  * the SAME 500-row table, so the only real growth step in the harness
  * data is sf0.01 → sf0.1). For each query the spec tallies SHUFFLE
  * RECORDS WRITTEN across every stage of the query's jobs (including
  * checkpoint/persist materializations, which per-plan metrics would
  * miss) via a SparkListener, then asserts growth ≤ g^1.7 where
  * g = corpus growth — comfortably above honest super-linear effects
  * (near-dup pair structure grows slightly faster than docs; fixed
  * per-job partition floors bias the ratio DOWN, not up) and far below
  * the g² of an all-pairs regression, which at g = 10 would show ~100×.
  *
  * The measured numbers are recorded in docs/SCALE.md §"Measured
  * scaling"; re-derive the table (plus wall times) with
  * `GRAFT_SCALE_TABLE=1 sbt "testOnly graft.ScalingSpec"`.
  */
class ScalingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val SfSmall = "/root/testdata/sf0.01"
  private val SfBig = "/root/testdata/sf0.1"
  // X2 minhash LSH, X4 capped Jaccard, X16 CC clustering (pairs + the
  // iterative label loop), X28 the full composed pipeline, X42/X52 the
  // BPE pair (train touches the corpus once — its loop is vocab-sized,
  // so shuffle growth should be FLAT-ish, far under the bound), X44b
  // the layout-composed pipeline (the suite's biggest query)
  private val Queries =
    Seq("minhash_lsh_candidates", "ngram_jaccard_pairs", "near_dup_cluster",
      "corpus_pipeline", "bpe_train_merges", "bpe_encode", "pipeline_layout",
      // r10 gram-hash family: winnow is row-local (explode only),
      // novelty/split-contamination shuffle gram hashes — all expected
      // ~linear in the corpus
      "winnow_fingerprints", "ngram_novelty", "split_contamination",
      // r13 similarity/indexing/sketch extension: LSH buckets and
      // postings shuffle ~linearly; the CMS sketch relation is
      // vocab-bounded; semdedup's SHUFFLE is linear by construction
      // (pairs are enumerated inside the cluster-bounded join, never
      // shuffled) — its per-cluster COMPUTE at the registry's fixed
      // K = 8 grows ~g², which is exactly why production scales K with
      // the corpus (docs/SCALE.md); wall times below surface that
      "ann_lsh_bucket_top1", "semdedup_prune", "tfidf_topk", "bm25_topk",
      "cms_heavy_hitters",
      // r15 window/temporal family over `events` (the last oracle
      // family without decade rows): the session window is one
      // (session_window, user) hash agg; asof is the union + running-
      // last window (one shuffle, zero join fanout); the range join is
      // the bucketed equi-join (probe ×2 explode); bloom's sketch
      // relation is fixed-size. All expected ~linear in events —
      // the sfx1 decade shifts user_id per copy, so per-user session/
      // as-of/range structure replicates within copies (10× users,
      // same per-user density) instead of densifying hot users
      "session_window_agg", "asof_join", "range_join_count",
      "bloom_prefilter",
      // r15: the span/chunk removal operators — chunk df-count +
      // flag-join and the winhash gram aggregate are both hash aggs
      // over corpus-linear relations; expected ~linear (the exact-dupe
      // corpora replicate their planted duplicate structure per copy)
      "corpus_chunk_dedup", "exact_substr_spans",
      // r15: DSIR selection — the model relation is CONSTANT-size
      // (8192 hashed buckets at any corpus), so shuffle growth is the
      // gram partials + per-doc agg, both corpus-linear; the `_k`
      // suffixing changes gram identities per copy but hashed buckets
      // stay the same fixed table
      "dsir_select",
      // r15: the quota/tercile windows — both shuffle the corpus once
      // on their partition key (source / lang) plus the tiny model
      // flows; expected ~linear (sfx1 keeps the same 20 sources and 5
      // languages, so partitions deepen 10× — exactly the straggler
      // regime their scaladocs bound with the two-phase fallback)
      "source_token_budget", "fluency_buckets",
      // r15: the mixture/drift reports — both are source-cardinality
      // aggregates over corpus-linear flows (doremi rides the fluency
      // relation's audited bigram pass; drift's only corpus pass is
      // the (source, term) count agg, everything downstream is
      // vocab-sized); expected ~linear, with the model-side relations
      // growing as the vocabulary (sub-linear by Heaps/Zipf)
      "doremi_weights", "source_unigram_drift",
      // r15: bucketed batching — one (bucket, shard) exchange carries
      // the row_number window AND the batch aggregate (batch is a
      // function of the window's partition keys); expected ~linear,
      // lanes bound every window partition
      "length_bucket_batches",
      // r15: the banding recall audit — rides the candidate family's
      // staged signatures + bounded pairs; the config sweep is a
      // row-local 6-way explode into a 6-row agg, so growth should
      // track minhash_lsh_candidates'
      "lsh_band_recall",
      // r15: the composed mix-side campaign — stage flags on one
      // source-keyed exchange + the constant-model DSIR stage; every
      // constituent is individually decade-measured, so the composed
      // growth should be their max (~linear)
      "mix_pipeline",
      // r15: the dedup-rate rollup — the staged CC labels + a
      // domain-map join + source-keyed agg; growth should track
      // near_dup_cluster's
      "dedup_rate_report",
      // r15: the fertility rollup — the X52 encode pass (measured via
      // bpe_encode) into a language-keyed aggregate; expected ~linear
      "bpe_fertility",
      // r16: PQ — training shuffle is the fused update aggregate's
      // map-combined partials (M·K·SubDim slots per task, FLAT in the
      // corpus); the scored relation is corpus × 10 bounded queries
      // through one q_id window exchange; expected ~linear with the
      // model-side constant
      "pq_adc_topk",
      // r16: the PQ recall audit — both scorings are corpus × bounded-
      // query broadcasts ranked on the bounded heap, so shuffle rows
      // stay model-/query-bounded like pq_adc_topk's
      "pq_recall_report",
      // r16: the containment matrix — distinct + source-count aggs are
      // corpus-linear; the self-join is cap²-bounded per shingle and
      // sfx1's `_k` suffixing replicates overlap structure within
      // copies (same 20 sources, disjoint shingles per copy), so pair
      // volume grows with shingles, not sources²; expected ~linear
      "source_overlap_matrix",
      // r17: contrastive mining — corpus × 10 bounded anchors through
      // one bounded-heap exchange (O(partitions·anchors·k) rows);
      // expected ~flat shuffle with the corpus scan growing linearly
      "hard_negative_mine",
      // r17: cluster-quota sampling — the kmeans core's flat Lloyd
      // shuffle + one K-keyed bounded-heap aggregate (≤ K·quota rows
      // past the exchange); expected ~flat like pq_adc_topk's model side
      "cluster_balanced_sample",
      // r17: candidate-graph PageRank — 3 fixed rounds of edge-join +
      // rank agg over the band-bounded candidate relation; shuffle
      // should track minhash_lsh_candidates' with a ×3 round constant
      "dup_graph_pagerank",
      // r17: kNN vote + eval decontamination — both corpus × bounded
      // broadcasts with map-combined aggregates; expected ~flat
      // shuffle like hard_negative_mine's
      "knn_label_eval", "embedding_decontam",
      // r17: the IVF tuning curve — the centroid/assignment flow is
      // ann_ivf_topk's (K constant, broadcast), the four bounded heaps
      // combine map-side to ≤ 4·k rows per query; expected ~linear
      // scan growth with query-bounded shuffle like pq_recall_report
      "ivf_nprobe_recall",
      // r17: the concentration report — one map-combined agg collapses
      // the corpus to source cardinality; shuffle = #sources, ~flat
      "domain_token_gini",
      // r17: deletion-neighborhood join — the variant fanout is a
      // bounded ≤17-rows/doc projection into ONE capped-set exchange
      // (per-bucket state O(cap) under any skew); pairs are per-bucket
      // array algebra, so shuffle grows with variants, ~linear
      "fuzzy_fingerprint_join",
      // r17: the confusion rollup — one map-combined (lang, pred)
      // count collapses the corpus to ≤ L·K cells; shuffle ~flat
      "lang_id_confusion",
      // r17: collocation mining — bigram/unigram counts are map-
      // combined aggs, stat joins are vocab-sized, the global top-K is
      // the bounded-heap kernel (O(K) per task); shuffle tracks the
      // vocabulary (sub-linear by Heaps), wall tracks the scan
      "collocation_lift",
      // r17: the coverage curve — one 4-width gram explode into a
      // map-combined (n, gram) type aggregate; shuffle tracks gram
      // TYPES (sub-corpus by Heaps), rollup is 4 rows
      "ngram_coverage_curve",
      // r18: weighted WOR sampling — ONE bounded-heap aggregate;
      // shuffle = sources × K, ~flat at any corpus size
      "weighted_sample_wor",
      // r18: Heaps'-law audit — first-seen min-agg collapses the
      // corpus to the TYPE relation; shuffle tracks vocabulary
      // (sub-linear — the very law it measures)
      "vocab_growth_curve",
      // r18: the salted join — left side is corpus-token-shaped
      // (~linear), right side vocab × 8; the per-doc rollup is
      // map-combinable, so shuffle tracks tokens, not pairs
      "salted_skew_join",
      // r18: the verify-threshold sweep — rides the staged signatures
      // and candidate-BOUNDED pairs; the exact side attaches per-doc
      // bounded shingle sets to the pair relation; sweep is 12 rows
      "dedup_threshold_sweep",
      // r18: the centroid audit — (label, dim) sums are map-combined
      // (classes × 64 rows), scoring is row-local vs ≤ L broadcast
      // centroids, final agg map-combined; shuffle ~flat
      "label_centroid_audit",
      // r18: the truncation audit — corpus × bounded-query broadcast,
      // three heaps combine map-side to ≤ 3·k rows per query;
      // shuffle query-bounded (~flat), wall tracks the scan
      "matryoshka_recall",
      // r18: the ablation matrix — ONE corpus pass to a ≤16-cell mask
      // histogram (map-combined), per-gate rollup on ≤64 rows;
      // shuffle ~flat (cells, not docs)
      "filter_ablation_matrix",
      // r18: prefix-group mining — row-local 8-token prefix hash into
      // one map-combined group count; shuffle tracks distinct
      // prefixes (sub-corpus), histogram is group-size-bounded
      "prefix_cache_report",
      // r18: per-source distinctive bigrams — map-combined
      // (source, gram) counts + vocab-shaped df join; the MinCnt
      // pre-filter bounds the ranking window's partitions, so
      // shuffle tracks the vocabulary (sub-linear by Heaps)
      "source_ngram_specificity",
      // r18: the calibration table — token explode into a map-
      // combined per-doc sum (one doc-keyed exchange, ~linear),
      // then a ≤10-key histogram; expected ~linear like X35's
      "quality_calibration_bins",
      // r18: the padding bill — X66's single (bucket, shard)
      // exchange + an O(cells) map-combined rollup to 1 row;
      // expected ~linear with length_bucket_batches' shuffle
      "pack_efficiency_report",
      // r18: batch diversity — same single exchange; per-batch
      // distinct-source sets are ≤ BatchDocs elements, histogram
      // has ≤ 16 keys; expected ~linear like X66's
      "batch_mixing_report",
      // r19: bitext mining — rides the staged signatures + candidate-
      // bounded pairs, plus two doc-keyed lang joins ON the pair
      // relation; shuffle should track minhash_lsh_candidates'
      "parallel_pair_mine",
      // r19: dedup × quality contingency — the CC labels + ONE
      // doc-keyed score join (both corpus-linear), 4-cell rollup;
      // shuffle should track near_dup_cluster's plus the score agg
      "quality_dup_lift",
      // r19: preference mining — token explode into a map-combined
      // per-doc score agg (~linear) then a strata-bounded extremes
      // agg (sources × langs rows); expected ~linear
      "pref_pair_mine",
      // r19: lexicon tagging — ONE map-combined per-doc agg with K
      // conditional counters; expected ~linear (per-doc rows out)
      "topic_lexicon_assign",
      // r19: the funnel — three user-keyed min-ts aggs on shrinking
      // relations; expected ~linear in events
      "funnel_report",
      // r19: cohort retention — user-keyed min-week + distinct
      // user-weeks BEFORE the join; expected ~linear in events
      "retention_cohorts",
      // r19: DAU/WAU — distinct (user, day) then the ≤7-way lattice
      // fanout; expected ~linear in events with the ×7 constant
      "stickiness_report",
      // r19: JSON histogram — row-local parse into ONE map-combined
      // bucket agg; shuffle ~flat (buckets), wall tracks the scan
      "json_props_histogram",
      // r19: MMR — corpus × bounded-query broadcast, bounded heap +
      // per-query collect of ≤ K0 members; shuffle query-bounded
      // (~flat), wall tracks the scoring scan
      "mmr_rerank",
      // r19: the triangle census — two equi-joins on the candidate-
      // bounded oriented edge relation; wedge volume is Σ deg² with
      // degrees bounded by the LSH bucket structure, so growth should
      // track the candidate relation's (~linear), never corpus²
      "dup_triangle_audit",
      // r19: path mining — ONE user-partitioned window (activity-
      // bounded partitions) into a ≤125-key map-combined path count;
      // expected ~linear in events
      "user_path_ngrams")
  private val MaxExponent = 1.7

  private case class Probe(secs: Double, shuffleRows: Long)

  private def measure(name: String, dir: String): Probe =
    measureFn(SparkEntry.queries(name), dir)

  private def measureFn(
      fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): Probe = {
    val tally = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) tally.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    // flush stage events still in flight from earlier suites BEFORE
    // attaching the tally — a prior query's late onStageCompleted would
    // otherwise inflate this query's row count (observed: +27% on
    // corpus_pipeline when run mid-suite vs isolated)
    org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
      Probe(secs, tally.get())
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
  }

  test("dedup-family shuffle volume grows sub-quadratically from sf0.01 to sf0.1") {
    val growth = Tables.documents(spark, SfBig).count().toDouble /
      Tables.documents(spark, SfSmall).count()
    assert(growth >= 5, s"harness data should grow ~10x, got $growth")
    val bound = math.pow(growth, MaxExponent)
    val rows = Queries.map { q =>
      val small = measure(q, SfSmall)
      val big = measure(q, SfBig)
      val ratio = big.shuffleRows.toDouble / math.max(1L, small.shuffleRows)
      System.err.println(
        f"[scaling] $q%-24s sf0.01: ${small.shuffleRows}%9d rows ${small.secs}%6.2f s | " +
          f"sf0.1: ${big.shuffleRows}%9d rows ${big.secs}%6.2f s | growth $ratio%6.1fx (bound $bound%5.1fx)")
      assert(ratio <= bound,
        s"$q shuffle rows grew ${ratio}x for ${growth}x data — super-quadratic-risk " +
          s"(bound ${bound}x); an all-pairs regression would show ~${growth * growth}x")
      (q, small, big, ratio)
    }
    if (sys.env.contains("GRAFT_SCALE_TABLE")) {
      System.err.println("| query | sf0.01 shuffle rows | sf0.01 s | sf0.1 shuffle rows | sf0.1 s | growth |")
      System.err.println("|---|---|---|---|---|---|")
      rows.foreach { case (q, s, b, r) =>
        System.err.println(
          f"| `$q` | ${s.shuffleRows}%,d | ${s.secs}%.2f | ${b.shuffleRows}%,d | ${b.secs}%.2f | ${r}%.1fx |")
      }
    }
  }

  /** The second measured decade (sf0.1 → a synthesized 10× "sfx1"),
    * pinning the growth trend one order beyond the driver-provided
    * data — opt-in (`GRAFT_SCALE_SF1=1`) because the large side runs
    * the composed pipelines at ~50k docs (minutes, not suite-budget).
    *
    * The sfx1 corpus is 10 deterministic copies of sf0.1's documents:
    * copy 0 verbatim, copies 1–9 with every word suffixed `_k` and
    * doc_id shifted by k·10⁷ (far below the 2^40 synthetic re-key
    * band). The suffix makes cross-copy text DISJOINT at the
    * gram/shingle/vocab level, so the decade models a bigger crawl of
    * NEW content — within-copy duplicate/near-dup structure replicates
    * exactly, cross-copy structure is nil — rather than a 10-way
    * exact-duplication blow-up whose candidate pairs would grow ~100×
    * by DATA design (every doc gaining 9 clones) while the operators
    * behaved perfectly.
    */
  test("dedup-family shuffle volume grows sub-quadratically from sf0.1 to sfx1 (opt-in)") {
    assume(sys.env.contains("GRAFT_SCALE_SF1"),
      "set GRAFT_SCALE_SF1=1 for the minutes-long 10x decade")
    val sfx1 = ScaleData.ensureSfx1(spark, SfBig)
    val growth = Tables.documents(spark, sfx1).count().toDouble /
      Tables.documents(spark, SfBig).count()
    assert(growth >= 9, s"sfx1 should be ~10x sf0.1, got $growth")
    val bound = math.pow(growth, MaxExponent)
    val rows = Queries.map { q =>
      val small = measure(q, SfBig)
      // ann_lsh runs the documented sizing POLICY, not a frozen knob:
      // LSH candidate volume is Θ(NumTables·N²/2^bits), so a fixed
      // width goes quadratic by construction (measured 67× for 10×
      // data at 16 bits — the regression this spec exists to catch,
      // except here it is the OPERATING RULE that scales the knob:
      // bits ≈ log₂N ⇒ +4 bits for the decade holds occupancy, and so
      // candidate growth, linear; docs/SCALE.md states the rule)
      val big =
        if (q == "ann_lsh_bucket_top1")
          measureFn(graft.operators.Similarity.annLshTop1WithBits(20), sfx1)
        else measure(q, sfx1)
      val ratio = big.shuffleRows.toDouble / math.max(1L, small.shuffleRows)
      System.err.println(
        f"[scaling-sf1] $q%-24s sf0.1: ${small.shuffleRows}%9d rows ${small.secs}%6.2f s | " +
          f"sfx1: ${big.shuffleRows}%9d rows ${big.secs}%6.2f s | growth $ratio%6.1fx (bound $bound%5.1fx)")
      assert(ratio <= bound,
        s"$q shuffle rows grew ${ratio}x for ${growth}x data — super-quadratic-risk " +
          s"(bound ${bound}x)")
      (q, small, big, ratio)
    }
    System.err.println("| query | sf0.1 shuffle rows | sf0.1 s | sfx1 shuffle rows | sfx1 s | growth |")
    System.err.println("|---|---|---|---|---|---|")
    rows.foreach { case (q, s, b, r) =>
      System.err.println(
        f"| `$q` | ${s.shuffleRows}%,d | ${s.secs}%.2f | ${b.shuffleRows}%,d | ${b.secs}%.2f | ${r}%.1fx |")
    }
  }
}

/** Deterministic synthetic decade above the largest driver-provided sf
  * (see the opt-in ScalingSpec test for the design rationale). */
object ScaleData {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  /** Build (once) and return the sfx1 dir: documents = 10 disjoint
    * content copies of `fromDir`'s table, ~10× the rows; embeddings =
    * 10 copies with the vector ROTATED left by k positions (norms —
    * and so within-copy near-dup structure — preserved exactly, while
    * cross-copy directions decorrelate: the embedding-space analog of
    * the `_k` word suffixing, modeling new content rather than a
    * 10-way clone blow-up). */
  def ensureSfx1(spark: SparkSession, fromDir: String): String = {
    val dir = "/tmp/graft-sfx1"
    if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
      val base = Tables.documents(spark, fromDir)
      val copies = (0 until 10).map { k =>
        if (k == 0) base
        else base.select(
          (col("doc_id") + k * 10000000L).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"_$k"))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      val base = Tables.embeddings(spark, fromDir)
      val copies = (0 until 10).map { k =>
        if (k == 0) base
        else base.select(
          (col("vec_id") + k * 10000000L).as("vec_id"),
          concat(expr(s"slice(embedding, ${k + 1}, ${64 - k})"),
            expr(s"slice(embedding, 1, $k)")).as("embedding"),
          col("label"))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    if (!new java.io.File(s"$dir/events.parquet/_SUCCESS").exists()) {
      // events decade: user_id shifted per copy → 10× USERS at the same
      // per-user event density (sessions, as-of chains, and range
      // windows replicate within copies, never merge across them —
      // the linear-growth regime these operators are designed for);
      // event_id shifted to stay unique; timestamps unchanged (a 10×
      // service sees more concurrent users, not a longer day)
      val base = Tables.events(spark, fromDir)
      val copies = (0 until 10).map { k =>
        if (k == 0) base
        else base.select(
          (col("event_id") + k * 1000000000L).as("event_id"), col("ts"),
          (col("user_id") + k * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    dir
  }
}
