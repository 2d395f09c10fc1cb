package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit contract of the fused per-cluster prune kernel: earlier-id
  * semantics, input-order independence, the exact τ boundary, and the
  * degenerate shapes the relational spelling handled implicitly.
  */
class SemDedupKeepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Run the kernel over one cluster given (vec_id, qu) members; norms
    * are derived. Returns the kept ids in output order. */
  private def keep(members: Seq[(Long, Seq[Long])]): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val rows = members.map { case (id, qu) =>
      Row(id, qu, qu.map(x => x * x).sum)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, qu ARRAY<BIGINT>, nrm BIGINT")
    val df = spark.createDataFrame(rows.asJava, schema)
      .agg(collect_list(struct(col("vec_id"), col("qu"), col("nrm"))).as("members"))
      .select(expr("graft_semdedup_keep(members)").as("kept"))
    df.collect().head.getSeq[Long](0)
  }

  test("exact copy of an earlier id is dropped; the original survives") {
    assert(keep(Seq(1L -> Seq(3L, 4L), 9L -> Seq(3L, 4L))) == Seq(1L))
  }

  test("earlier-id semantics ignore input arrival order") {
    // same cluster delivered in reverse arrival order — the kernel
    // sorts by vec_id internally, so 1 still wins over 9
    assert(keep(Seq(9L -> Seq(3L, 4L), 1L -> Seq(3L, 4L))) == Seq(1L))
  }

  test("a dropped member still drops later members (a ranges over ALL earlier)") {
    // chain at ~25° steps: cos(1,5) ≈ 0.908 (5 dropped by 1),
    // cos(5,9) ≈ 0.903 but cos(1,9) ≈ 0.64 — so 9 is dropped ONLY via
    // the already-dropped 5, exactly the join spelling's semantics
    // (the a side ranges over all earlier members, dropped or not)
    assert(keep(Seq(1L -> Seq(100L, 0L), 5L -> Seq(91L, 42L), 9L -> Seq(64L, 77L)))
      == Seq(1L))
  }

  test("τ test: parallel drops, orthogonal and anti-parallel survive") {
    // parallel (cos = 1 ≥ τ): dropped — and magnitude-independent,
    // the shorter copy is still a duplicate
    assert(keep(Seq(1L -> Seq(10L, 0L), 2L -> Seq(9L, 0L))) == Seq(1L))
    // orthogonal: dot = 0 fails the dot > 0 guard → both survive
    assert(keep(Seq(1L -> Seq(10L, 0L), 2L -> Seq(0L, 10L))) == Seq(1L, 2L))
    // anti-parallel: dot < 0 → survives (the guard, not the square,
    // decides — (−dot)² would pass the magnitude test)
    assert(keep(Seq(1L -> Seq(10L, 0L), 2L -> Seq(-10L, 0L))) == Seq(1L, 2L))
    // near the threshold from both sides: cos ≈ 0.908 drops,
    // cos ≈ 0.64 survives (the 25°-step vectors from the chain test)
    assert(keep(Seq(1L -> Seq(100L, 0L), 2L -> Seq(91L, 42L))) == Seq(1L))
    assert(keep(Seq(1L -> Seq(100L, 0L), 2L -> Seq(64L, 77L))) == Seq(1L, 2L))
  }

  test("singleton and empty clusters") {
    assert(keep(Seq(7L -> Seq(1L, 2L))) == Seq(7L))
    // empty members array → empty kept array (no crash); slice keeps
    // the containsNull=false element type the kernel's contract needs
    val out = spark.sql("SELECT graft_semdedup_keep(slice(" +
      "array(named_struct('vec_id', 1L, 'qu', array(1L), 'nrm', 1L)), 1, 0)) AS kept")
      .collect().head.getSeq[Long](0)
    assert(out.isEmpty)
  }

  test("output is ascending vec_id") {
    val kept = keep(Seq(30L -> Seq(1L, 0L), 10L -> Seq(0L, 1L), 20L -> Seq(1L, 1L)))
    assert(kept == kept.sorted)
  }
}
