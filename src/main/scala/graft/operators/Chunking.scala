package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup.{h60Duck, h60Sql}

/** Document chunking for retrieval/RAG ingestion: fixed-stride windows
  * (the standard overlap baseline) and content-defined chunking (CDC —
  * rolling-hash boundaries, the rsync/LBFS trick), which keeps chunk
  * boundaries STABLE under edits: inserting a sentence shifts every
  * fixed-stride chunk after it, but only the one CDC chunk containing
  * the edit changes — what you want when re-embedding a recrawled
  * corpus incrementally.
  */
object Chunking {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed chunking: window of [[ChunkSize]] tokens every [[Stride]]
    * (overlap = ChunkSize − Stride). */
  val ChunkSize = 64
  val Stride = 48

  /** CDC: boundary after token i when the h60 of the trailing
    * [[CdcWindow]]-token window ≡ 0 (mod [[CdcMod]]) — expected chunk
    * length = CdcMod tokens. */
  val CdcWindow = 4
  val CdcMod = 8

  // ---------------------------------------------------------------------
  // X36 fixed_chunks
  // ---------------------------------------------------------------------

  /** Overlapping fixed-stride chunks as a pure generator explode — the
    * chunk list is computed row-local (no shuffle, no join; the only
    * Exchange is the output sort). */
  val fixedChunks: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n", size(col("words")))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (n - 1) div $Stride),
           |  k -> named_struct(
           |    'chunk_text', array_join(slice(words, k * $Stride + 1, $ChunkSize), ' '),
           |    'n_chunk', CAST(size(slice(words, k * $Stride + 1, $ChunkSize)) AS BIGINT)))"""
          .stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.chunk_text").as("chunk_text"), col("col.n_chunk").as("n_chunk"))
      .orderBy("doc_id", "chunk_idx")
  val fixedChunksSql: String =
    s"""SELECT doc_id, k AS chunk_idx,
       |       array_to_string(list_slice(words, k * $Stride + 1, k * $Stride + $ChunkSize), ' ')
       |         AS chunk_text,
       |       CAST(len(list_slice(words, k * $Stride + 1, k * $Stride + $ChunkSize)) AS BIGINT)
       |         AS n_chunk
       |FROM (
       |  SELECT doc_id, words,
       |         unnest(range(0, (len(words) - 1) // $Stride + 1)) AS k
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------
  // X37 cdc_chunks
  // ---------------------------------------------------------------------

  /** Content-defined chunks. Shape: explode to (doc, pos, tok) — tokens
    * only, the doc array is never carried per row — then the rolling
    * window is [[CdcWindow]] `lag`s in ONE per-doc window spec (codegen'd
    * window functions, partitions bounded by doc length, all docs in
    * parallel), the boundary flag prefix-sums into a chunk id in the
    * same spec, and one hash agg rebuilds chunk text in token order. */
  val cdcChunks: Q = (spark, dir) => {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val lags = (CdcWindow - 1 to 1 by -1).map(k => lag(col("tok"), k).over(w)) :+ col("tok")
    val flagged = toks
      .withColumn("wkey", concat_ws(" ", lags: _*))
      .withColumn("flag",
        when(col("pos") >= CdcWindow - 1 &&
          expr(s"${h60Sql("wkey")} % $CdcMod") === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(
        sum(col("flag")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    flagged.groupBy("doc_id", "chunk_id")
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)"),
          " ").as("chunk_text"),
        count(lit(1)).as("n_chunk"))
      .orderBy("doc_id", "chunk_id")
  }
  val cdcChunksSql: String = {
    val lagCols = (CdcWindow - 1 to 1 by -1)
      .map(k => s"lag(tok, $k) OVER (PARTITION BY doc_id ORDER BY pos) AS l$k")
      .mkString(", ")
    val wkey = "concat_ws(' ', " +
      ((CdcWindow - 1 to 1 by -1).map(k => s"l$k") :+ "tok").mkString(", ") + ")"
    s"""SELECT doc_id, chunk_id,
       |       string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
       |       count(*) AS n_chunk
       |FROM (
       |  SELECT doc_id, pos, tok,
       |         coalesce(CAST(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS chunk_id
       |  FROM (
       |    SELECT doc_id, pos, tok,
       |           CASE WHEN pos >= ${CdcWindow - 1}
       |                 AND ${h60Duck(wkey)} % $CdcMod = 0
       |                THEN 1 ELSE 0 END AS flag
       |    FROM (
       |      SELECT doc_id, pos, tok, $lagCols
       |      FROM (
       |        SELECT doc_id,
       |               unnest(string_split(text, ' ')) AS tok,
       |               generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
       |        FROM documents))))
       |GROUP BY 1, 2
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "fixed_chunks" -> fixedChunks,
    "cdc_chunks" -> cdcChunks,
  )
  val oracles: Map[String, String] = Map(
    "fixed_chunks" -> fixedChunksSql,
    "cdc_chunks" -> cdcChunksSql,
  )
}
