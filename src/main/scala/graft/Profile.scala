package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Stage-level profiler for local perf iteration: runs each named query
  * [[Reps]] times into the noop sink and prints, for the LAST (warm)
  * run, every stage's wall duration, executor-run-time sum, and task
  * count — the attribution data the bench's min-of-N total hides.
  * Usage: sbt "runMain graft.Profile /root/testdata/sf0.1 q1 q2 ..."
  */
object Profile {
  private val Reps = 3
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("graft-profile")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("argmax_per_group")
    case class St(name: String, wallMs: Long, runMs: Long, tasks: Int)
    val stages = mutable.ArrayBuffer.empty[St]
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += St(si.name.takeWhile(_ != '\n').take(60), wall,
          si.taskMetrics.executorRunTime, si.numTasks)
      }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 until Reps).foreach { _ =>
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted async — give the bus a beat to drain
      Thread.sleep(300)
      println(f"===== $n%s: $dt%.3f s, $jobs%d jobs, ${stages.size}%d stages =====")
      stages.foreach(s => println(f"  ${s.wallMs}%6d ms wall ${s.runMs}%6d ms run ${s.tasks}%4d tasks  ${s.name}%s"))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
