package graft
import org.apache.spark.sql.SparkSession

/** One place for engine session construction so Verify, Bench, and the
  * test suites all run with identical semantics-relevant configuration.
  */
object Sessions {
  def builder(appName: String): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); read nanos as raw longs
      // (Tables.events truncates to micros). Session-level so query
      // functions stay pure.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // ObjectHashAggregate (collect_list/typed-imperative aggs: the
      // shingle grouping, inverted index, spans lists) falls back to
      // SORT-based aggregation after this many in-memory keys — the
      // 128-key default turns every such agg over real key counts into
      // a full sort of its input. Group state here is small (df-capped
      // lists, span structs), so keys are cheap; 1M keys of ~100-byte
      // state bounds the agg map at ~100 MB per task — sized for the
      // executor memory this harness runs with, and the same tuning a
      // production cluster applies per its own task memory budget.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // engine extensions: native expressions (graft_dot, …)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
  }

  def get(appName: String): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
