package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.sources.UserSnapshot

/** The user-snapshot CDC pipeline (SURVEY §3.2; scrapers/user.py:92-123 →
  * db/user.py:12-40 → firestore/user.py:6-13 + firebase.py:27-36):
  *
  *   online/staff pages ─ onlineScan (S5) ─ profile fan-out (J5)
  *     ─ profileScan (S4) → snapshots
  *     ─ CDC ingest: argmax current (A1) ⋈ incoming, change-suppress
  *       ignoring ts (A3), emit (new, old) pairs (db/user.py:40)
  *     ─ claims diff: only users whose claims JSON changed go to the
  *       identity sink (S11 analog; firestore/user.py:12)
  *
  * All-relational: one shuffle for the incoming argmax, one join against
  * current state; claims math is pure projection.
  */
object UserPipeline {

  /** Reduce possibly-repeated incoming snapshots to latest-per-user
    * (A1 as a max_by hash aggregate), join against the current state,
    * and keep only genuinely-changed or brand-new users — the diff
    * ignores `ts`, exactly like db/user.py:20-26. Output carries the
    * (new, old) pair downstream, like the reference's
    * `new_user_snapshot` event (db/user.py:40). */
  def cdcIngest(snapshots: Dataset[UserSnapshot], current: DataFrame): DataFrame = {
    val incoming = snapshots.toDF()
      .groupBy(col("userId"))
      .agg(max_by(struct(col("ts"), col("username"), col("isFarmhand"), col("isRanger")),
        col("ts")).as("n"))
      .select(col("userId"), col("n.ts").as("new_ts"), col("n.username").as("new_username"),
        col("n.isFarmhand").as("new_isFarmhand"), col("n.isRanger").as("new_isRanger"))
    val cur = current.select(col("userId"), col("ts").as("old_ts"),
      col("username").as("old_username"), col("isFarmhand").as("old_isFarmhand"),
      col("isRanger").as("old_isRanger"))
    incoming.join(cur, Seq("userId"), "left")
      .filter(col("old_ts").isNull || // get_or_create: brand-new user (J4)
        !(col("new_username") <=> col("old_username")) ||
        !(col("new_isFarmhand") <=> col("old_isFarmhand")) ||
        !(col("new_isRanger") <=> col("old_isRanger")))
  }

  /** Claims propagation: build the conditional-role claims JSON for the
    * new and old snapshot of each changed pair and keep only rows whose
    * claims actually differ (firestore/user.py:6-13 — snapshots can
    * change in ways that don't affect claims). */
  def changedClaims(pairs: DataFrame): DataFrame = {
    def role(farmhand: org.apache.spark.sql.Column, ranger: org.apache.spark.sql.Column) =
      when(ranger, "ranger").when(farmhand, "farmhand")
    pairs
      .withColumn("new_claims",
        Fns.claimsJson(col("new_username"), role(col("new_isFarmhand"), col("new_isRanger"))))
      .withColumn("old_claims",
        when(col("old_ts").isNotNull,
          Fns.claimsJson(col("old_username"), role(col("old_isFarmhand"), col("old_isRanger")))))
      .filter(!(col("new_claims") <=> col("old_claims")))
      .select(col("userId"), col("new_claims"), col("old_claims"))
  }
}
