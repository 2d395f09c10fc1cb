package graft.operators

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The r18-verdict ask for X128: the zone-map manifest is computed from
  * data — prove it describes what a scanner would ACTUALLY skip by
  * physically writing the Z-ordered layout (one parquet file per
  * manifest file_id) and comparing every manifest row's min/max/count
  * against the written file's own Parquet FOOTER statistics, read
  * through the parquet-hadoop file-format API. If these match, the
  * prune counts `zone_map_prune_audit` reports over the manifest are
  * exactly the files a min/max-pruning scan planner skips.
  */
class ZoneMapFooterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private case class Stats(rows: Long, mins: Map[String, Long], maxs: Map[String, Long])

  /** Aggregate footer statistics (row count, per-column min/max) over
    * all blocks of one parquet file. */
  private def footerStats(path: String, cols: Seq[String]): Stats = {
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), conf)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = rdr.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      def stats(c: String) = blocks.map { b =>
        val chunk = b.getColumns.asScala
          .find(_.getPath.toDotString == c)
          .getOrElse(fail(s"column $c missing from footer of $path"))
        val st = chunk.getStatistics
        assert(st != null && st.hasNonNullValue, s"no footer stats for $c in $path")
        (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
          st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
      }
      val mins = cols.map(c => c -> stats(c).map(_._1).min).toMap
      val maxs = cols.map(c => c -> stats(c).map(_._2).max).toMap
      Stats(rows, mins, maxs)
    } finally rdr.close()
  }

  test("manifest min/max/count equals the written files' Parquet footer statistics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zmap_").toFile
    try {
      val assigned = Layout.assignedOf(Layout.zorderInput(spark, Dir))
      // one physical file per manifest file_id: repartition by the key
      // (each key entirely within one task), then partitionBy splits
      // per-key files out of each task
      assigned
        .repartition(org.apache.spark.sql.functions.col("file_id"))
        .write.partitionBy("file_id").mode("overwrite")
        .parquet(tmp.getAbsolutePath)

      val manifest = Layout.manifestOf(Layout.zorderInput(spark, Dir))
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(manifest.nonEmpty)

      val dirs = tmp.listFiles.filter(_.getName.startsWith("file_id="))
      assert(dirs.length == manifest.size,
        s"expected ${manifest.size} physical files, found ${dirs.length}")

      dirs.foreach { d =>
        val fid = d.getName.stripPrefix("file_id=").toLong
        val parts = d.listFiles.filter(_.getName.endsWith(".parquet"))
        assert(parts.length == 1, s"file_id=$fid split across ${parts.length} files")
        val st = footerStats(parts.head.getAbsolutePath, Seq("len_b", "lang_b", "z"))
        val m = manifest(fid)
        // manifest columns: file_id, n_rows, z_min, z_max, len_min,
        // len_max, lang_min, lang_max
        assert(st.rows == m.getLong(1), s"file_id=$fid row count")
        assert(st.mins("z") == m.getLong(2) && st.maxs("z") == m.getLong(3),
          s"file_id=$fid z bounds: footer ${st.mins("z")}..${st.maxs("z")}")
        assert(st.mins("len_b") == m.getLong(4) && st.maxs("len_b") == m.getLong(5),
          s"file_id=$fid len_b bounds")
        assert(st.mins("lang_b") == m.getLong(6) && st.maxs("lang_b") == m.getLong(7),
          s"file_id=$fid lang_b bounds")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("the Morton claim on real footers: the SECOND dimension's ranges stay narrow") {
    // lexicographic-sort strawman: every file's lang_b footer range
    // would be full-width; under Morton order at least half the files
    // must have a sub-full lang_b range (the prune_permille > 0 claim
    // measured on the actual written statistics, not the manifest)
    val tmp = java.nio.file.Files.createTempDirectory("graft_zmap2_").toFile
    try {
      Layout.assignedOf(Layout.zorderInput(spark, Dir))
        .repartition(org.apache.spark.sql.functions.col("file_id"))
        .write.partitionBy("file_id").mode("overwrite")
        .parquet(tmp.getAbsolutePath)
      val ranges = tmp.listFiles.filter(_.getName.startsWith("file_id=")).map { d =>
        val p = d.listFiles.filter(_.getName.endsWith(".parquet")).head
        val st = footerStats(p.getAbsolutePath, Seq("lang_b"))
        st.maxs("lang_b") - st.mins("lang_b")
      }
      val fullWidth = 15L // 2^ZBits - 1
      assert(ranges.count(_ < fullWidth) * 2 >= ranges.length,
        s"lang_b footer ranges not narrow: ${ranges.mkString(",")}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }
}
