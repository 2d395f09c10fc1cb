package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped TRAINED-MODEL artifacts — the driver-held outputs of
  * an iterative training loop (PQ codebooks, k-means centroids), the
  * second kind of campaign-shared intermediate next to
  * [[Tables.stage]]'s relations. A campaign session trains each model
  * once and every consumer query rides the artifact — the production
  * operating mode, where codebooks/centroids are versioned artifacts a
  * pipeline ships, not per-query work (the reference retrains nothing
  * per request either; its models are process-lifetime state).
  *
  * OFF BY DEFAULT: sharing is gated on the session conf
  * `graft.stage.models` so the per-query bench semantics — every
  * isolated run re-pays its full compute — hold without the bench
  * having to know which queries train models. `graft.CampaignBench`
  * flips the flag for its campaign half only; with the flag off,
  * `artifact` is a transparent pass-through and the calling query's
  * plan is bit-identical to the unshared spelling.
  *
  * Registry discipline is [[Tables]]'s: weak session keys, SoftReference
  * values (an artifact may transitively hold DataFrames → the session;
  * the soft value is the only path keeping a stopped session reachable,
  * so memory pressure clears it and the weak key evicts). `name` must
  * fully key the artifact's DEFINITION (data dir + variant parameters)
  * — the registry returns whatever was first trained under the name.
  */
object Models {

  /** Session conf gate for cross-query model/stage sharing. */
  val Flag = "graft.stage.models"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(Flag).exists(_.toBoolean)

  /** Per-name cell: training runs under the CELL's lock, so one slow
    * training (PQ codebooks) blocks only concurrent requests for the
    * SAME artifact, never lookups of unrelated names (r18 ADVICE). The
    * session map's own lock covers only get-or-create of cells. */
  private final class Cell {
    var ref: java.lang.ref.SoftReference[AnyRef] =
      new java.lang.ref.SoftReference[AnyRef](null)
  }

  private type Registry =
    java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, Cell]]

  private val artifacts: Registry = new Registry()

  /** The trained artifact under `name` for this session — trains at
    * most once per session while [[Flag]] is set; a pure pass-through
    * (train every call) while it is not. */
  def artifact[T <: AnyRef](spark: SparkSession, name: String)(train: => T): T = {
    if (!enabled(spark)) return train
    val perSession = artifacts.synchronized {
      var m = artifacts.get(spark)
      if (m == null) { m = scala.collection.mutable.Map.empty; artifacts.put(spark, m) }
      m
    }
    val cell = perSession.synchronized(perSession.getOrElseUpdate(name, new Cell))
    cell.synchronized {
      Option(cell.ref.get) match {
        case Some(v) => v.asInstanceOf[T]
        case None =>
          val trained = train
          cell.ref = new java.lang.ref.SoftReference[AnyRef](trained)
          trained
      }
    }
  }

  /** Drop this session's artifacts so the next access retrains —
    * campaign epoch boundaries (CampaignBench's wipe) and ad-hoc
    * sessions whose corpus changed. */
  def invalidate(spark: SparkSession): Unit = {
    val m = artifacts.synchronized { Option(artifacts.get(spark)) }
    m.foreach(mm => mm.synchronized(mm.clear()))
  }

  /** Test seam: live artifact count for this session. */
  private[graft] def artifactCount(spark: SparkSession): Int =
    artifacts.synchronized {
      Option(artifacts.get(spark))
        .map(_.valuesIterator.count(_.ref.get != null)).getOrElse(0)
    }
}
