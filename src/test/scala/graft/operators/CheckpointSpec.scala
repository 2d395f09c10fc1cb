package graft.operators

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The CC loop's cluster-durability knob: with
  * `spark.graft.reliableCheckpoints=true` (+ a checkpoint dir) every
  * lineage cut goes through reliable `checkpoint()` — replayable from
  * distributed storage after executor loss — and the labels must be
  * bit-identical to the default localCheckpoint mode (the fixpoint is
  * unique, so durability is purely an execution-layer choice). */
class CheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("reliable-checkpoint mode writes to the checkpoint dir and matches local mode") {
    val local = Dedup.nearDupCluster(spark, Dir).collect().toSeq
    val ckptDir = Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    spark.conf.set("spark.graft.reliableCheckpoints", "true")
    try {
      val reliable = Dedup.nearDupCluster(spark, Dir).collect().toSeq
      assert(reliable == local,
        "labels must be identical under reliable checkpointing")
      val written = Files.walk(ckptDir).filter(Files.isRegularFile(_)).count()
      assert(written > 0, s"expected checkpoint files under $ckptDir")
    } finally {
      spark.conf.set("spark.graft.reliableCheckpoints", "false")
    }
  }
}
