package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Data-level skew tests: the plan-shape suite proves the right
  * operators are used; this suite proves the BOUNDS hold on
  * adversarial data — the df-cap actually caps, and hot keys don't
  * blow up candidate generation. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ngram df-cap: a boilerplate shingle shared by every doc generates ZERO pairs from it") {
    import spark.implicits._
    // 500 docs, each 'w<i> a b c' + unique tail words: the 3-gram 'a b c'
    // appears in all 500 docs (df=500 > cap=100) while each doc keeps
    // unique shingles. Without the cap: ~125k pairs from one shingle.
    val docs = (0 until 500)
      .map(i => (i.toLong, s"w$i a b c u${i}x u${i}y u${i}z"))
      .toDF("doc_id", "text")
    val sh = docs
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words)-3)," +
          " i -> concat_ws(' ', words[i], words[i+1], words[i+2]))")).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val blocked = df.filter(col("df") > 100).select("sh")
    assert(blocked.as[String].collect().toSet == Set("a b c"),
      "exactly the boilerplate shingle must trip the cap")
    val kept = sh.join(blocked, Seq("sh"), "left_anti")
    val pairs = kept.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "b -> struct(a AS doc_a, b AS doc_b))))")).as("p"))
    // per-doc shingles are otherwise unique → no pairs survive at all
    assert(pairs.count() == 0,
      "the capped relation must not generate a single pair from the hot shingle")
    // and max per-key list size is bounded by the cap
    val maxList = kept.groupBy("sh").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).as[Long].collect().head
    assert(maxList <= 100)
  }

  test("AQE splits a skewed join partition at runtime (the fact-join hot-key story)") {
    import spark.implicits._
    // SCALE.md leaves fact-join skew to AQE rather than manual salting;
    // prove AQE actually fires: one key owning 90% of the left side gets
    // its partition split (skew=true in the final adaptive plan) and the
    // join result stays exact. Thresholds are lowered so testdata-sized
    // partitions count as skewed.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // pad must be incompressible and survive to the output: skew
      // detection reads COMPRESSED map-output sizes, and 90k identical
      // rows otherwise shrink below any threshold
      val left = ((1 to 90000).map(i => (0L, i)) ++
          (1 to 10000).map(i => (i.toLong % 1000, i)))
        .toDF("k", "i")
        .withColumn("pad", md5(concat_ws(":", col("k"), col("i"))))
      val right = (0L to 999L).toDF("k").withColumn("v", col("k") * 2)
      // execute the join itself: a groupBy on the join key downstream
      // would legitimately suppress the split (it would break the
      // partitioning the aggregate wants to reuse)
      val joined = left.join(right, "k").select(col("k"), col("pad"))
        .as[(Long, String)]
      val got = joined.collect().groupBy(_._1).view.mapValues(_.size).toMap
      assert(got(0L) == 90010) // 90000 hot + 10 from the modulo tail
      assert(got(7L) == 10)
      // executedPlan of the dataset that actually ran: AQE has finalized
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot partition's join as skew-handled:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed range join: one hot user stays an equi-join with bounded per-bucket fanout") {
    import spark.implicits._
    // one user produces 2000 clicks in a single 6h bucket; 50 quiet users
    val W = 21600L
    val clicks =
      ((0 until 2000).map(i => (99L, new java.sql.Timestamp(1000L * (i % W)))) ++
        (1 to 50).map(u => (u.toLong, new java.sql.Timestamp(1000L * u))))
        .toDF("user_id", "c_ts")
        .withColumn("bk", expr(s"unix_micros(c_ts) div ${W * 1000000L}"))
    val purchases = ((1 to 50).map(u => (u.toLong, u.toLong, new java.sql.Timestamp(1000L * u + 1))) :+
        (999L, 99L, new java.sql.Timestamp(1000L * 3600)))
      .toDF("event_id", "user_id", "ts")
    val probes = purchases.select(col("event_id"), col("user_id"), col("ts"),
      explode(array(expr(s"unix_micros(ts) div ${W * 1000000L}"),
        expr(s"unix_micros(ts) div ${W * 1000000L}") - 1)).as("bk"))
    val joined = probes.join(clicks, Seq("user_id", "bk"))
      .filter(col("c_ts") >= col("ts") - expr(s"INTERVAL $W SECONDS") && col("c_ts") <= col("ts"))
    val plan = joined.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"hot key must not degrade the join strategy:\n$plan")
    val counts = joined.groupBy("event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts(999L) == 2000L, "hot user's trailing count is exact")
    (1 to 50).foreach(u => assert(counts(u.toLong) == 1L))
  }
}
