package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.operators.Pipeline

/** One crawl result: a freshly-fetched document, or a removal marker
  * (`removed = true`, `new_text` null) for a URL that has gone away. */
case class Recrawl(doc_id: Long, new_text: String, removed: Boolean)

/** Streaming twin of [[graft.operators.Pipeline.incrementalPipeline]] —
  * the reference's actual operating mode: a continuous scraper whose
  * every fetch is an upsert-or-skip against the stored copy
  * (db/chat.py:13-26, scrapers/chat.py:158-171), here as a Structured
  * Streaming `foreachBatch` loop over crawl results.
  *
  * Per micro-batch:
  *   1. diff the batch against the persisted content-hash state — a
  *      LEFT join (batch side drives; docs not crawled this batch are
  *      untouched, which is what distinguishes the continuous mode from
  *      the batch query's full-snapshot full-outer diff); equal-hash
  *      rows are SKIPPED (no output, no state write) — the
  *      upsert-or-skip contract;
  *   2. run [[Pipeline.deltaStages]] over the delta — the SAME function
  *      the batch query prices, so batch/stream parity is by shared
  *      code, and the per-row cost of a micro-batch is identical to the
  *      batch delta's;
  *   3. merge the state: upsert (doc_id, hash) for added/changed rows,
  *      delete for removals, snapshot-swapped like [[MergeSink]] (a
  *      production cluster swaps in Delta/Iceberg `MERGE INTO` with the
  *      same call sites).
  *
  * State is hash-only — O(|corpus|) keys × 16 bytes, never the text —
  * so the state table at 100 TB of corpus is ~100 GB of hashes:
  * partitionable, mergeable, and far smaller than any snapshot diff
  * input. The state write is batch-serial (foreachBatch guarantee).
  *
  * Junk-gated docs still update the hash state: the gate drops them
  * from the OUTPUT (training corpus), but the stored hash must reflect
  * what was crawled or every recrawl would re-process the same junk —
  * same reason the reference stores the raw page hash before deciding
  * what to index.
  */
object IncrementalStream {

  /** Hash-state rows at `statePath`: (doc_id, h). */
  def readState(spark: SparkSession, statePath: String): DataFrame =
    if (new java.io.File(statePath).exists()) spark.read.parquet(statePath)
    else spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit("").as("h")).limit(0)

  /** Process ONE batch of crawl results against the state at
    * `statePath`; returns the delta-stage output rows (same schema as
    * the batch query: doc_id, status, n_tokens, n_emails, n_phones) and
    * merges the state. Exposed separately from [[start]] so the spec
    * can also drive it directly against a hand-built state. */
  def processBatch(batch: DataFrame, statePath: String): DataFrame = {
    val spark = batch.sparkSession
    val state = readState(spark, statePath)
    // replay/page-overlap safety; a doc both crawled and removed in one
    // batch resolves to the crawl (the fetch is fresher evidence than a
    // stale 404 from an earlier page of the same poll)
    val crawled = batch.filter(!col("removed"))
      .select(col("doc_id"), col("new_text"), md5(col("new_text")).as("h_new"))
      .dropDuplicates("doc_id")
    val removals = batch.filter(col("removed")).select("doc_id")
      .join(crawled.select("doc_id"), Seq("doc_id"), "left_anti")
      .dropDuplicates("doc_id")
    val upserts = crawled.join(state, Seq("doc_id"), "left_outer")
      .withColumn("status",
        when(col("h").isNull, lit("added"))
          .when(col("h") =!= col("h_new"), lit("changed")))
      .filter(col("status").isNotNull) // equal hash → skip entirely
    val retired = removals.join(state, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), lit("removed").as("status"),
        lit(null).cast("string").as("new_text"))
    // delta-sized; read by deltaStages' two branches AND the state merge
    val diff = upserts.select("doc_id", "status", "new_text")
      .unionByName(retired).persist()
    val out = Pipeline.deltaStages(diff).localCheckpoint()
    // state merge: upsert new hashes, drop removals
    val touched = diff.select("doc_id")
    val nextState = state.join(touched, Seq("doc_id"), "left_anti")
      .unionByName(upserts.select(col("doc_id"), col("h_new").as("h")))
    MergeSink.writeSnapshot(nextState, statePath)
    diff.unpersist()
    out
  }

  /** Start the continuous query: crawl results in, delta rows handed to
    * `onDelta` per micro-batch, hash state maintained at `statePath`. */
  def start(recrawl: Dataset[Recrawl], statePath: String, name: String)(
      onDelta: (DataFrame, Long) => Unit): StreamingQuery =
    recrawl.toDF().writeStream
      .queryName(name)
      .outputMode(OutputMode.Append())
      .foreachBatch(Streams.isolated { (batch: DataFrame, batchId: Long) =>
        onDelta(processBatch(batch, statePath), batchId)
      })
      .start()
}
