package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Dedup.h60Duck

/** Physical-layout planning: the pass that decides HOW a curated corpus
  * is written back to storage so that every later scan can skip most of
  * it. At 100 TB the dominant cost of the downstream pipeline is
  * re-reading the corpus; multi-dimensional clustering (Z-order — the
  * same technique behind Delta's OPTIMIZE ZORDER BY and commercial
  * warehouses' clustering keys) makes per-file min/max statistics
  * selective on EVERY clustered dimension at once, where a plain sort
  * is selective on its leading key only.
  */
object Layout {
  type Q = (SparkSession, String) => DataFrame

  /** Bits per clustered dimension (4 → 16 buckets per dim, 256 cells). */
  private val ZBits = 4
  /** Target rows per output file. The testdata instantiation (64) keeps
    * ~8 files at sf0.01; a real campaign derives it from the target
    * file size (e.g. 1 GB / avg row width). */
  private val RowsPerFile = 64L

  /** Interleave two [[ZBits]]-bit integers x,y into the 2·ZBits-bit
    * Morton code x₀y₀x₁y₁… — pure shift/mask arithmetic, identical in
    * any engine with 64-bit ints. */
  private def mortonSql(x: String, y: String): String =
    (0 until ZBits).map(b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})")
      .mkString("(", ") | (", ")")

  /** `zorder_layout` — plan a Z-ordered rewrite of `documents` clustered
    * on (length, language): bucket both dimensions to [[ZBits]] bits,
    * interleave into a Morton code, assign rows to fixed-size files in
    * Morton order, and emit the FILE MANIFEST — per file: row count and
    * min/max of each dimension — which is exactly the metadata a scan
    * planner prunes on. Because Morton order keeps both dimensions
    * locally coherent, the min/max ranges stay narrow on BOTH `len_b`
    * and `lang_b` (a lexicographic sort would leave the second key's
    * range full-width in every file).
    *
    * Scale shape: the Morton code is a row-local projection. File
    * assignment needs a global rank in z-order — computed two-phase
    * exactly like [[TrainingMix.globalRowIndex]]: rank WITHIN each of
    * the ≤ 2^(2·ZBits) z-cells (parallel, bounded windows), prefix-sum
    * the 256-row cell-count relation, broadcast the offsets back. No
    * corpus-wide sort; the final manifest agg is map-side combinable.
    * (The rewrite itself would be `repartitionByRange(z)` + write —
    * the manifest is the decision artifact the oracle can check.)
    */
  /** The manifest core over any (doc_id, len_b, lang_b) relation —
    * shared by `zorder_layout` and the composed `pipeline_layout`. */
  private[operators] def manifestOf(d0: DataFrame): DataFrame = {
    val d = d0.withColumn("z", expr(mortonSql("len_b", "lang_b")))
    val ranked = d.withColumn("rn",
      row_number().over(Window.partitionBy("z").orderBy("doc_id")))
    val offsets = d.groupBy("z").agg(count(lit(1)).as("zn"))
      .withColumn("off", coalesce(
        sum(col("zn")).over(Window.orderBy("z")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("z", "off")
    ranked.join(broadcast(offsets), "z")
      .withColumn("file_id", expr("(off + rn - 1) div " + RowsPerFile))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("z").as("z_min"), max("z").as("z_max"),
        min("len_b").as("len_min"), max("len_b").as("len_max"),
        min("lang_b").as("lang_min"), max("lang_b").as("lang_max"))
      .orderBy("file_id")
  }

  /** CTE suffix + final select producing the manifest over a relation
    * `rel(doc_id, len_b, lang_b)` (caller opens the WITH). */
  private[operators] def manifestSql(rel: String): String = {
    val morton = mortonSql("len_b", "lang_b")
    s"""zz AS (SELECT doc_id, len_b, lang_b, $morton AS z FROM $rel),
       |rr AS (SELECT *, (row_number() OVER (ORDER BY z, doc_id) - 1) // $RowsPerFile AS file_id
       |      FROM zz)
       |SELECT file_id, count(*) AS n_rows,
       |       min(z) AS z_min, max(z) AS z_max,
       |       min(len_b) AS len_min, max(len_b) AS len_max,
       |       min(lang_b) AS lang_min, max(lang_b) AS lang_max
       |FROM rr GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  val zorderLayout: Q = (spark, dir) =>
    manifestOf(Tables.documents(spark, dir)
      .select(col("doc_id"),
        least(expr(s"n_chars div 64"), lit((1 << ZBits) - 1)).as("len_b"),
        expr(s"pmod(${Dedup.h60Sql("lang")}, ${1 << ZBits})").as("lang_b")))
  val zorderLayoutSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         least(n_chars // 64, ${(1 << ZBits) - 1}) AS len_b,
       |         ${h60Duck("lang")} % ${1 << ZBits} AS lang_b
       |  FROM documents),
       |${manifestSql("d")}""".stripMargin

  /** `pipeline_layout` — the composed write-planning pass: run the full
    * curation pipeline ([[Pipeline.corpusPipeline]] — dedup → CC
    * resolve → span removal → quality/PII → resample → pack) and plan
    * the Z-ordered layout of ITS survivors, clustered on
    * (token length, language). This is the missing last stage of a real
    * campaign: what ships to storage is the curated mix, laid out so
    * every later scan prunes on both dimensions. Composition is the
    * point (the registry's other composed query stops at packing):
    * the manifest consumes the pipeline's own n_tokens/lang columns,
    * and the oracle nests the entire already-proven pipeline CTE chain
    * as a subquery — one hash checks both the pipeline and the layout
    * arithmetic end-to-end.
    */
  val pipelineLayout: Q = (spark, dir) =>
    manifestOf(Pipeline.corpusPipeline(spark, dir)
      .select(col("doc_id"),
        least(expr("n_tokens div 4"), lit((1 << ZBits) - 1)).as("len_b"),
        expr(s"pmod(${Dedup.h60Sql("lang")}, ${1 << ZBits})").as("lang_b")))
  // NOTE: the pipeline SQL is concatenated OUTSIDE any stripMargin —
  // it contains continuation lines that start with '||' (string
  // concat), which an enclosing stripMargin would truncate to '|'.
  val pipelineLayoutSql: String =
    "WITH pipe AS (\n" + Pipeline.corpusPipelineSql + "\n),\n" +
      s"""d AS (
         |  SELECT doc_id,
         |         least(n_tokens // 4, ${(1 << ZBits) - 1}) AS len_b,
         |         ${h60Duck("lang")} % ${1 << ZBits} AS lang_b
         |  FROM pipe),
         |${manifestSql("d")}""".stripMargin

  val queries: Map[String, Q] = Map(
    "zorder_layout" -> zorderLayout,
    "pipeline_layout" -> pipelineLayout,
  )
  val oracles: Map[String, String] = Map(
    "zorder_layout" -> zorderLayoutSql,
    "pipeline_layout" -> pipelineLayoutSql,
  )
}
