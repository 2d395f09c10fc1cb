package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup.{h60Sql, h60Duck}

/** Sketch summaries: tiny fixed-size aggregates of a big relation that
  * downstream stages broadcast instead of shuffling the relation
  * itself. First resident: a Bloom filter, the scale companion to the
  * J6 `anti_join_seen_set` — at 100 TB you don't shuffle the full seen
  * set against every incoming batch; you broadcast a Bloom summary,
  * drop the definite-misses for free, and reserve the exact anti-join
  * for the (rare) potential hits.
  *
  * The sketch is PORTABLE: bit positions come from the md5-derived
  * `h60` hash family, the filter is 32 lanes × 32 bits (bit 31 is the
  * highest used, so every lane stays non-negative in a BIGINT in both
  * engines), and lane assembly is a `bit_or` aggregate — map-side
  * combinable, one row out. The DuckDB oracle rebuilds the identical
  * filter from the identical arithmetic, so even the false positives
  * match bit-for-bit (they are a deterministic function of the hash
  * family, not noise).
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  private val LaneBits = 32

  /** Bloom sizing law: m = n·ln(1/p)/ln²2 bits for n expected keys at
    * target false-positive rate p (optimal hash count k = (m/n)·ln 2).
    * Rounded up to the next power of two so `pmod(h, m)` can compile to
    * a mask at scale. The size MUST track the seen-set: a fixed m is
    * still correct when n ≫ m (false positives are re-checked by the
    * exact join downstream) but useless — every probe answers
    * maybe-true and the prefilter drops nothing. At 10⁹ seen keys and
    * p = 1%, the law gives ~1.2 GB — still a broadcast, not a shuffle.
    */
  def sizeBits(expectedN: Long, fpRate: Double): Long = {
    // misuse fails loudly: p ≥ 1 would make ln(1/p) ≤ 0 and silently
    // return the floor; m ≥ 2^62 would overflow the power-of-two round-up
    require(expectedN > 0, s"expectedN must be positive, got $expectedN")
    require(fpRate > 0.0 && fpRate < 1.0, s"fpRate must be in (0, 1), got $fpRate")
    // Long arithmetic throughout: at n = 10⁹, p = 1% the law already
    // gives ~9.6e9 bits, which Int math would silently saturate and
    // fold to the 32-bit floor
    val m = math.ceil(
      expectedN * math.log(1.0 / fpRate) / (math.log(2.0) * math.log(2.0))).toLong
    require(m < (1L << 62), s"requested filter of $m bits overflows the power-of-two round-up")
    // next power of two ≥ m
    math.max(LaneBits.toLong, java.lang.Long.highestOneBit(math.max(1L, m - 1)) * 2)
  }

  /** Testdata instantiation: the sf0.01 seen set (first-week signups)
    * is 141 users; at a ~8% target FP rate the law gives 742 → 1024
    * bits — the same constant every round's oracle has hashed against,
    * so the bit pattern stays verifiable across rounds. */
  private val ExpectedSeenN = 141L
  private val TargetFpRate = 0.08
  private val Bits = sizeBits(ExpectedSeenN, TargetFpRate).toInt // = 1024
  private val Lanes = Bits / LaneBits // 32 lanes
  private val NumHashes = 2

  private val EV =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** `bloom_prefilter` — build a Bloom filter of the "known" users (the
    * [[Relational.distinctMembership]] seen set: signups in the first
    * week) and test EVERY distinct user against it. Output: one row per
    * user with the membership verdict — true members always flag
    * (no false negatives, by construction); ~6% of others flag as the
    * hash family's deterministic false positives, which the exact
    * anti-join would then re-check.
    */
  val bloomPrefilter: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val seen = ev.filter(col("event_type") === "signup" &&
        col("ts") < to_timestamp(lit("2024-01-08 00:00:00")))
      .select(col("user_id")).distinct()
    val positions = (0 until NumHashes).map(i =>
      expr(s"pmod(${h60Sql(s"concat('$i:', user_id)")}, $Bits)").as(s"pos$i"))
    val lanes = seen.select(positions: _*)
      .select(explode(array((0 until NumHashes).map(i => col(s"pos$i")): _*)).as("pos"))
      .groupBy()
      .agg(array((0 until Lanes).map(j =>
        coalesce(bit_or(when(expr(s"pos div $LaneBits") === j,
          expr(s"shiftleft(1L, CAST(pos % $LaneBits AS INT))")).otherwise(0L)), lit(0L)))
        : _*).as("lanes"))
    val users = ev.select(col("user_id")).distinct()
      .select((col("user_id") +:
        (0 until NumHashes).map(i =>
          expr(s"pmod(${h60Sql(s"concat('$i:', user_id)")}, $Bits)").as(s"pos$i"))): _*)
    val hit = (0 until NumHashes).map(i =>
      expr(s"(element_at(lanes, CAST(pos$i div $LaneBits AS INT) + 1)" +
        s" >> CAST(pos$i % $LaneBits AS INT)) & 1") === 1).reduce(_ && _)
    users.crossJoin(lanes) // one-row sketch: the broadcast the planner always picks
      .withColumn("maybe_seen", hit)
      .select(col("user_id"), col("maybe_seen"))
      .orderBy("user_id")
  }
  val bloomPrefilterSql: String = {
    def posDuck(i: Int, rel: String): String =
      s"${h60Duck(s"'$i:' || CAST($rel.user_id AS VARCHAR)")} % $Bits"
    val laneExprs = (0 until Lanes).map(j =>
      s"coalesce(bit_or(CASE WHEN pos // $LaneBits = $j THEN (CAST(1 AS BIGINT) << (pos % $LaneBits)) ELSE 0 END), 0)")
      .mkString(",\n    ")
    val posCols = (0 until NumHashes).map(i => s"${posDuck(i, "u")} AS pos$i").mkString(", ")
    val hit = (0 until NumHashes).map(i =>
      s"((lanes[(pos$i // $LaneBits) + 1] >> (pos$i % $LaneBits)) & 1) = 1").mkString(" AND ")
    s"""WITH seen AS (
       |  SELECT DISTINCT user_id FROM $EV
       |  WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-08 00:00:00'),
       |pos AS (
       |  SELECT unnest([${(0 until NumHashes).map(i => posDuck(i, "seen")).mkString(", ")}]) AS pos
       |  FROM seen),
       |bloom AS (SELECT [$laneExprs] AS lanes FROM pos),
       |u AS (SELECT DISTINCT user_id FROM $EV),
       |test AS (SELECT u.user_id, $posCols FROM u)
       |SELECT user_id, $hit AS maybe_seen
       |FROM test CROSS JOIN bloom
       |ORDER BY user_id""".stripMargin
  }

  val queries: Map[String, Q] = Map("bloom_prefilter" -> bloomPrefilter)
  val oracles: Map[String, String] = Map("bloom_prefilter" -> bloomPrefilterSql)
}
