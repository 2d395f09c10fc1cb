package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X141 law spec: the single-pass max-anchor DP equals the
  * DEFINITION — a from-scratch JVM search for chains
  * v < c < p (in (ts, event_id) order) with t_p − t_v ≤ 24 h —
  * on the harness corpus, plus crafted deadline-edge journeys the
  * corpus can't guarantee (anchor refresh, boundary-exact chains,
  * out-of-window decoys). */
class WindowFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val W = 86400L * 1000000L

  private type Ev = (Long, Long, String) // (micros, event_id, sym)

  /** Definition-level level computation: brute-force chain existence. */
  private def bruteLevel(evs: Seq[Ev]): Int = {
    val s = evs.sortBy(e => (e._1, e._2))
    def after(a: Ev, b: Ev) = b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)
    val vs = s.filter(_._3 == "v"); val cs = s.filter(_._3 == "c")
    val ps = s.filter(_._3 == "p")
    val l3 = vs.exists(v => cs.exists(c => after(v, c) &&
      ps.exists(p => after(c, p) && p._1 - v._1 <= W)))
    val l2 = vs.exists(v => cs.exists(c => after(v, c) && c._1 - v._1 <= W))
    if (l3) 3 else if (l2) 2 else if (vs.nonEmpty) 1 else 0
  }

  private def report(levels: Seq[Int]): Seq[(Long, String, Long, Long)] = {
    val names = Seq("view", "click", "purchase")
    val ns = (1 to 3).map(k => levels.count(_ >= k).toLong)
    (1 to 3).map { k =>
      val prev = if (k == 1) ns(0) else ns(k - 2)
      (k.toLong, names(k - 1), ns(k - 1),
        if (prev == 0) 0L else ns(k - 1) * 1000 / prev)
    }
  }

  test("equals the brute-force chain search on the harness corpus") {
    val byUser = graft.Tables.events(spark, Dir)
      .filter("event_type IN ('view','click','purchase')")
      .selectExpr("user_id", "unix_micros(ts)", "event_id",
        "substring(event_type, 1, 1)")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    val expected = report(byUser.values.map(bruteLevel).toSeq)
    val got = SparkEntry.queries("window_funnel")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the 24 h deadline actually separates levels on this corpus
    assert(got.map(_._3).distinct.size > 1, s"degenerate report: $got")
  }

  test("crafted deadline edges: anchor refresh, boundary-exact, decoys") {
    // journeys as (micros, id, sym); h = hours in micros
    def h(x: Long) = x * 3600L * 1000000L
    val cases: Seq[(Seq[Ev], Int)] = Seq(
      // boundary-exact: purchase lands EXACTLY 24 h after the view — ≤ holds
      (Seq((0L, 1, "v"), (h(1), 2, "c"), (h(24), 3, "p")), 3),
      // one micro past the deadline with no later anchor: level 2 only
      (Seq((0L, 1, "v"), (h(1), 2, "c"), (h(24) + 1, 3, "p")), 2),
      // ANCHOR REFRESH: the first view is too old, but a second view
      // re-anchors the chain — the max-anchor DP must pick it up
      (Seq((0L, 1, "v"), (h(30), 2, "v"), (h(31), 3, "c"), (h(32), 4, "p")), 3),
      // the refreshed anchor must gate level 2 too: click 25 h after
      // BOTH views is out of window for each
      (Seq((0L, 1, "v"), (h(1), 2, "v"), (h(26), 3, "c")), 1),
      // same-timestamp chain resolved by event_id order
      (Seq((0L, 1, "v"), (0L, 2, "c"), (0L, 3, "p")), 3),
      // reversed ids at one timestamp: the purchase PRECEDES the click
      // in delivery order, so no level-3 chain exists
      (Seq((0L, 1, "v"), (0L, 3, "c"), (0L, 2, "p")), 2),
      // purchase before any view: never counts
      (Seq((0L, 1, "p"), (h(1), 2, "v"), (h(2), 3, "c")), 2),
      // no views at all: level 0
      (Seq((0L, 1, "c"), (h(1), 2, "p")), 0),
      // PRE-EPOCH chain: every anchor is a NEGATIVE micros value — the
      // DP's not-reached sentinel must sit below any real timestamp
      // (Long.MinValue, r19 ADVICE; a -1 sentinel silently refuses all
      // t <= -1 anchors while the definitional oracle join converts)
      (Seq((-h(3), 1, "v"), (-h(2), 2, "c"), (-h(1), 3, "p")), 3),
      // pre-epoch chain crossing into post-epoch within the deadline
      (Seq((-h(12), 1, "v"), (-h(1), 2, "c"), (h(11), 3, "p")), 3),
      // pre-epoch view, conversion past the deadline: level 1 only
      (Seq((-h(30), 1, "v"), (-h(2), 2, "c")), 1))
    cases.zipWithIndex.foreach { case ((evs, want), i) =>
      assert(bruteLevel(evs) == want, s"case $i: brute force disagrees with the design")
    }
    // and the engine DP agrees with the brute force on every case, via
    // a one-user-per-case synthetic corpus run through the registered
    // aggregate expression shape
    import spark.implicits._
    val df = cases.zipWithIndex.flatMap { case ((evs, _), u) =>
      evs.map(e => (u.toLong, e._1, e._2, e._3))
    }.toDF("user_id", "t", "id", "sym")
    val got = df
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("t"),
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("sym")).as("e"))
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.array_sort(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.col("e"))).as("evs"))
      .select(org.apache.spark.sql.functions.col("user_id"),
        // the EXACT registered fold (shared builder), not a spec copy —
        // sentinel arithmetic included
        org.apache.spark.sql.functions.expr(Windows.funnelLevelSql(W))
          .as("level"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i) == want, s"case $i: DP level ${got(i)}, expected $want")
    }
  }
}
