package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit helper: print the formatted physical plan of named
  * registered queries (all of them when none are named). Usage:
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 q1 q2 ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("graft-explain")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
