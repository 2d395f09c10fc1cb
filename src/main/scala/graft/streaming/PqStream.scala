package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.operators.Semantic

/** One incoming vector to encode (an embedded document/image at the
  * ingest boundary). */
case class IncomingVec(vec_id: Long, embedding: Seq[Float])

/** Streaming twin of [[Semantic.pqAdcTopk]]'s ENCODE side — the
  * encode-at-ingest deployment (Jégou et al.'s operating mode at
  * scale: train the codebooks once on a reference corpus, then encode
  * the stream as it arrives; search runs later over the accumulated
  * 4-byte codes, not the raw floats). Every micro-batch is encoded
  * with the SAME [[Semantic.pqEncode]] projection the batch query
  * runs — parity by shared code.
  *
  * The frozen artifact here is even lighter than [[DsirStream]]'s
  * persisted model relation: the codebooks are driver-held literals
  * BAKED INTO THE PLAN (M·K·SubDim longs), so there is no model
  * DataFrame to persist, nothing to unpersist on termination, and a
  * batch's cost is one stateless codegen projection over the batch —
  * no join, no shuffle, no watermark, replay trivially idempotent.
  * Retraining is a new [[start]] (the blue/green artifact lifecycle,
  * same as a deployed tokenizer). */
object PqStream {

  /** Train on `refDir`'s embeddings, freeze, and encode the stream;
    * encoded (vec_id, code0..3) rows for each micro-batch go to
    * `onEncoded` with the batch id. */
  def start(vecs: Dataset[IncomingVec], refDir: String, name: String)(
      onEncoded: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = vecs.sparkSession
    val cents = Semantic.pqTrainOn(spark, refDir)
    require(cents.head.nonEmpty,
      s"empty reference corpus at $refDir — no codebook to freeze")
    vecs.toDF().writeStream
      .queryName(name)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // NOT Streams.isolated: encoding is stateless and idempotent,
        // so the right failure mode is fail-the-batch and let
        // Structured Streaming replay it (the DsirStream rationale)
        val encoded = Semantic.pqEncode(batch, cents).persist()
        try {
          encoded.count() // materialize before the sink reads
          onEncoded(encoded, batchId)
        } finally { encoded.unpersist(); () }
      }
      .start()
  }
}
