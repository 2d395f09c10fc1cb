package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (saves ~6 s of
  * startup per suite; sbt forks one JVM for the whole test run). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Sessions.registerMetricsLogger(s) // graft_* tripwire metrics in specs too
    s
  }
}
