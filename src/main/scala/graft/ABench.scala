package graft

/** Throwaway interleaved A/B harness (deleted after recording the
  * decision in docs/SCALE.md, per the measurement discipline): runs the
  * named query alternating variant confs inside ONE JVM, min/median of
  * N per variant. Usage: runMain graft.ABench <sfDir> <query> [reps]
  */
object ABench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("graft-abench")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val fn = SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      dt
    }
    // warmup both confs
    spark.conf.set("spark.sql.adaptive.enabled", "true"); run()
    spark.conf.set("spark.sql.adaptive.enabled", "false"); run()
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      spark.conf.set("spark.sql.adaptive.enabled", "true"); a += run()
      spark.conf.set("spark.sql.adaptive.enabled", "false"); b += run()
    }
    def stats(xs: Seq[Double]) = f"min ${xs.min}%.3f med ${xs.sorted.apply(xs.size / 2)}%.3f  [${xs.map(x => f"$x%.2f").mkString(" ")}]"
    println(s"[abench] $name AQE-on:  ${stats(a.toSeq)}")
    println(s"[abench] $name AQE-off: ${stats(b.toSeq)}")
    spark.stop()
  }
}
