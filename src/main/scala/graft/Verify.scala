package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, only @ _*) = args
    val spark = Sessions.get("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Env-drift forensics: record each table's SCANNED schema in the
    // driver log, so a regenerated-testdata round (r13 lost 30 queries
    // to a silent events.ts dtype change) is diagnosable from the log
    // alone. TestdataContractSpec is the failing tripwire; this is the
    // evidence trail.
    Tables.names.foreach { n =>
      try System.err.println(s"[verify] schema $n: " +
        Tables.table(spark, sfDir, n).schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] schema $n: UNREADABLE ${e.getMessage}")
      }
    }
    val picked = // optional name filter for local iteration; driver passes none
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only.toSet).toMap
    picked.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Same hygiene as Bench: queries that persist intermediates
      // (corpus_pipeline's three stage caches, signature relations) must
      // not accumulate block-manager storage across an 88-query run.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
