package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Semantic (embedding-space) curation: k-means cluster assignment and
  * SemDeDup-style within-cluster near-duplicate pruning — the
  * embedding-side complement to the token-side dedup family in
  * [[Dedup]]. (SemDeDup: Abbas et al. 2023, arXiv:2303.09540 — cluster
  * the corpus, then search for duplicates only inside clusters, which
  * bounds the quadratic candidate set.)
  *
  * Numeric policy — everything is EXACT integer arithmetic:
  *  - embeddings are quantized once: `floor(x * 10^6)` (float→double
  *    cast and the multiply are correctly-rounded IEEE ops, floor is
  *    exact → both engines quantize identically);
  *  - k-means uses a SHIFTED copy (`+ 10^6`, non-negative): squared
  *    L2 distances are translation-invariant, and keeping division
  *    operands non-negative makes Spark's `div` (truncate) and the
  *    oracle's `//` agree by construction;
  *  - centroid updates are floor-divided integer means;
  *  - cosine thresholds compare `dot² · 100 ≥ 81 · |a|² · |b|²`
  *    (τ = 0.9) as `(10·dot)² ≥ (9·|a|²)·(9·|b|²)` in exact 128-bit
  *    integer arithmetic ([[graft.expressions.MulGe]]) — no sqrt, no
  *    doubles, no ulp risk, no per-pair decimal allocation.
  * Lloyd iterations are FIXED at [[Iters]] assignment rounds and the
  * oracle unrolls the same rounds, so the fixpoint question never
  * arises: both engines run the identical finite computation.
  */
object Semantic {
  type Q = (SparkSession, String) => DataFrame

  /** Cluster count. At 100 TB this scales with N (SemDeDup used ~50k
    * clusters for LAION): the point of K is to bound per-cluster
    * pairwise work at N²/K, so K grows linearly with the corpus. */
  val K = 8

  /** Assignment rounds (assign → update → assign = 2). */
  val Iters = 2

  /** Quantization scale and non-negativity shift (|x| < 1 in unit-ish
    * embeddings → shifted values in [0, 2·10^6)). */
  val QScale = 1000000L
  val QShift = 1000000L

  /** Cosine threshold τ = 0.9 as the exact rational test
    * dot² · SimDen ≥ SimNum · |a|² · |b|² (with dot > 0). */
  val SimNum = 81L
  val SimDen = 100L

  private val Dim = 64

  // ---------------------------------------------------------------------
  // shared k-means core
  // ---------------------------------------------------------------------

  /** (vec_id, q, na) with q = shifted quantized embedding and
    * na = ‖q‖² via the codegen'd [[graft.expressions.DotProductLong]]
    * kernel — precomputed once so every distance below is
    * na − 2·(q·c) + ‖c‖², one fused-loop dot per centroid instead of a
    * per-element interpreted fold. */
  private def quantShifted(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      expr(s"graft_quant(embedding, ${QScale}L, ${QShift}L)").as("q"))
      .withColumn("na", expr("graft_doti(q, q)"))

  /** K seed centroids as the one-row cents ARRAY directly: the K
    * vectors with the smallest `md5(vec_id)` — a deterministic
    * pseudo-random draw (same trick as the hash-coin samplers), ids
    * 0..K-1 in md5 order (sort_array on md5-keyed structs = md5 order,
    * array positions = cids). Building the array here skips the
    * row_number Window's SinglePartition exchange the r13 spelling
    * paid just to number 8 rows. */
  private def seedArr(vecs: DataFrame): DataFrame =
    vecs.withColumn("mh", md5(col("vec_id").cast("string")))
      .orderBy("mh").limit(K)
      .agg(sort_array(collect_list(struct(col("mh"), col("q"), col("na")))).as("seeds"))
      .select(expr(
        s"""transform(sequence(0, ${K - 1}), i -> named_struct(
           |  'cid', CAST(i AS BIGINT), 'c', seeds[i].q, 'nc', seeds[i].na))"""
          .stripMargin).as("cents"))

  /** (cid, c, nc) rows → the one-row cid-sorted cents array.
    * coalesce(1), not an exchange: cents is K rows (here 8) spread
    * over the update-agg's shuffle partitions; the narrow merge lets
    * the collect-to-array agg run partial+final in ONE stage instead
    * of paying a SinglePartition exchange stage for K rows. */
  private def centsArr(cents: DataFrame): DataFrame =
    cents.coalesce(1).agg(
      sort_array(collect_list(struct(col("cid"), col("c"), col("nc")))).as("cents"))

  /** Nearest-centroid assignment as a PURE PROJECTION: the K centroids
    * ride along as a one-row broadcast array (`arr`: from [[seedArr]]
    * or [[centsArr]]) and each row folds over them — no shuffle, no
    * join on the corpus. Ties break to the lowest cid (the array is
    * cid-sorted and `array_min` compares (d, cid)). */
  private def assign(vecs: DataFrame, arr: DataFrame): DataFrame = {
    vecs.crossJoin(broadcast(arr))
      // Σ(q−c)² expanded to na − 2·q·c + nc: all three terms exact longs,
      // identical to the folded form, but the per-centroid cost is one
      // codegen'd graft_doti loop instead of an interpreted element fold
      .withColumn("best", expr(
        """array_min(transform(cents, cc -> named_struct(
          |  'd', na - 2L * graft_doti(q, cc.c) + cc.nc,
          |  'cid', cc.cid)))""".stripMargin))
      .select(col("vec_id"), col("q"), col("na"),
        col("best.cid").as("cid"), col("best.d").as("d"))
  }

  /** Integer-mean centroid update as ONE map-side-combinable hash
    * aggregate: Dim elementwise long sums + a count per cid (the shuffle
    * carries K·(Dim+1) partial-sum slots per map task — O(1) per
    * partition however large the corpus), then floor-divide and re-pack.
    * The r12 spelling posexploded to (cid, pos, v) rows — Dim× the
    * corpus row count through two back-to-back shuffles (cid,pos then
    * cid); the fused form computes the identical floor-divided means
    * (`sum(q[i]) div count` ≡ the per-(cid,pos) `sum(col) div count`)
    * with one shuffle and no row blowup. */
  private def updateCents(asg: DataFrame): DataFrame = {
    val sums = (0 until Dim).map(i => sum(col("q").getItem(i)).as(s"s$i"))
    asg.groupBy("cid")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cid"),
        array((0 until Dim).map(i => expr(s"s$i div n")): _*).as("c"))
      .withColumn("nc", expr("graft_doti(c, c)"))
  }

  /** [[Iters]] assignment rounds over (vec_id, q, na). The quantized
    * corpus is persisted once (it feeds seeding and every round's row
    * path); each ROUND's assignment is consumed exactly once — only by
    * the next centroid update — because round i+1's row input is the
    * corpus itself (an assignment never filters or reorders its input
    * rows, so `assign(v, ·)` and `assign(assign(v, ·) projected back,
    * ·)` read the same relation). The r12 shape persisted every round's
    * assignment for a second consumer that this formulation simply
    * doesn't have — one cache materialization instead of Iters of them. */
  private def kmeans(vecs: DataFrame): DataFrame = {
    val v = vecs.persist()
    (2 to Iters).foldLeft(assign(v, seedArr(v))) { (a, _) =>
      assign(v, centsArr(updateCents(a)))
    }
  }

  /** The same rounds as DuckDB CTEs over `rel(vec_id, embedding)`
    * (caller opens the WITH). */
  private[operators] def kmeansCtes(rel: String): String = {
    def assignCte(dRel: String, cRel: String, d: String, a: String) =
      s"""$d AS (
         |  SELECT v.vec_id, c.cid,
         |         list_sum(list_transform(range(1, ${Dim + 1}),
         |                  i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS d
         |  FROM $dRel v CROSS JOIN $cRel c),
         |$a AS (
         |  SELECT vec_id, cid, d FROM (
         |    SELECT vec_id, cid, d,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |    FROM $d)
         |  WHERE rn = 1)""".stripMargin
    s"""quant AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT) + $QShift) AS q
       |  FROM $rel),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
       |              AS BIGINT) AS cid, q AS c
       |  FROM quant ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $K),
       |${assignCte("quant", "c0", "d1", "a1")},
       |c1 AS (
       |  SELECT cid, list(cv ORDER BY pos) AS c FROM (
       |    SELECT a.cid, r.i AS pos, sum(v.q[r.i]) // count(*) AS cv
       |    FROM a1 a JOIN quant v USING (vec_id) CROSS JOIN range(1, ${Dim + 1}) r(i)
       |    GROUP BY 1, 2)
       |  GROUP BY 1),
       |${assignCte("quant", "c1", "d2", "a2")}""".stripMargin
  }

  // ---------------------------------------------------------------------
  // X32 kmeans_assign
  // ---------------------------------------------------------------------

  /** Final cluster assignment over `embeddings` after [[Iters]] Lloyd
    * rounds: (vec_id, cluster, dist). */
  val kmeansAssign: Q = (spark, dir) => {
    val a = kmeans(quantShifted(Tables.embeddings(spark, dir)))
    a.select(col("vec_id"), col("cid").as("cluster"),
        col("d").cast("long").as("dist"))
      .orderBy("vec_id")
  }
  val kmeansAssignSql: String =
    s"""WITH ${kmeansCtes("embeddings")}
       |SELECT vec_id, cid AS cluster, CAST(d AS BIGINT) AS dist
       |FROM a2 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // X33 semdedup_prune
  // ---------------------------------------------------------------------

  /** Exact-copy re-ingestions of every 7th vector — the provably
    * exercised positive path, same practice as the dedup corpora. */
  private def dupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    e.unionByName(e.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + Dedup.ReKeyA).as("vec_id"), col("embedding")))
  }
  private val DupCorpusSql =
    s"""(SELECT vec_id, embedding FROM embeddings
       | UNION ALL
       | SELECT vec_id + ${Dedup.ReKeyA} AS vec_id, embedding FROM embeddings
       | WHERE vec_id % 7 = 0)""".stripMargin

  /** SemDeDup: cluster, then drop every vector that has an
    * earlier-id near-duplicate (cos ≥ τ) in its own cluster. The
    * pairwise search is CLUSTER-BOUNDED — the self-join key is the
    * cluster id, so candidate pairs are N²/K, never N²; K scales with
    * the corpus to hold cluster sizes constant. Cosine is the exact
    * integer test on UNSHIFTED quantized vectors (dot and norms fit a
    * LONG at 64 dims; the cross-multiplied comparison runs in
    * decimal(38,0) / int128). */
  val semdedupPrune: Q = (spark, dir) => {
    // Three consumers of one kmeans run (both sides of the pair join
    // and the final anti-join base) share ONE materialization, held as
    // a session STAGE table (like the MinHash signature): a campaign
    // that prunes repeatedly in one session pays the Lloyd rounds
    // once. The pre-persist `repartition(cid)` is NOT consumer
    // co-location — Spark 4 compiles cached plans adaptively, so
    // InMemoryTableScan reports unknown partitioning and consumers
    // re-shuffle regardless (measured) — but it still pays for itself
    // as the cache's COMPUTE layout: without it the relation keeps the
    // 2-partition union-of-scans layout and every consumer's first
    // stage runs 2-wide (measured +0.3 s at sf0.1). At 100 TB the
    // persist swaps for writing the assignment stage-table once per
    // campaign, cid-bucketed so downstream joins ARE co-located
    // (docs/SCALE.md — a parquet/bucketed stage table, unlike Spark's
    // in-memory cache, does expose its partitioning); cid balance is K
    // scaling with the corpus plus AQE skew splitting.
    val asg = Tables.stage(spark, s"semdedup_assign:$dir") {
      kmeans(quantShifted(Tables.fanout(dupCorpus(spark, dir))))
        .withColumn("qu", expr(s"transform(q, x -> x - $QShift)"))
        .withColumn("nrm", expr("graft_doti(qu, qu)"))
        .select("vec_id", "cid", "qu", "nrm")
        .repartition(K, col("cid"))
    }
    val a = asg.select(col("cid"), col("vec_id").as("a_id"),
      col("qu").as("a_qu"), col("nrm").as("a_nrm"))
    val b = asg.select(col("cid"), col("vec_id").as("b_id"),
      col("qu").as("b_qu"), col("nrm").as("b_nrm"))
    // τ = 0.9 as an EXACT integer test with perfect-square constants:
    // dot²·SimDen ≥ SimNum·|a|²·|b|²  ⇔  (10·dot)² ≥ (9·|a|²)·(9·|b|²)
    // (SimDen = 10², SimNum = 9²), evaluated by the 128-bit native
    // compare [[graft.expressions.MulGe]] — the r12 spelling ran three
    // decimal(38,0) multiplications per candidate pair. Factor bounds:
    // 10·dot ≤ 10·64·(10^6)² < 2^63, 9·nrm likewise — no overflow
    // before the kernel's 128-bit products.
    val dropped = a.join(b, "cid")
      .filter(col("a_id") < col("b_id"))
      .withColumn("dot", expr("graft_doti(a_qu, b_qu)"))
      .filter(col("dot") > 0 &&
        expr("graft_mulge(10L * dot, 10L * dot, 9L * a_nrm, 9L * b_nrm)"))
      // no distinct: the only consumer is a LEFT ANTI join, whose
      // semantics ignore duplicate build keys — a dedup pass here is a
      // whole extra shuffle stage for nothing (the oracle keeps its
      // DISTINCT: NOT IN wants it)
      .select(col("cid"), col("b_id").as("vec_id"))
    // anti join on (cid, vec_id), not vec_id alone: a dropped b_id's
    // pair lives in b's OWN cluster, so its asg row carries the same
    // cid — the extra key changes nothing semantically but lets the
    // cid-hash partitioning both sides already have satisfy the join's
    // distribution (HashPartitioning(cid) clusters any (cid, …) key
    // set): zero exchanges here, where the vec_id-only spelling
    // re-shuffled BOTH sides of the corpus
    asg.join(dropped, Seq("cid", "vec_id"), "left_anti")
      .select(col("vec_id"), col("cid").as("cluster"))
      .orderBy("vec_id")
  }
  val semdedupPruneSql: String =
    s"""WITH corpus AS (SELECT * FROM $DupCorpusSql),
       |${kmeansCtes("corpus")},
       |pr AS (
       |  SELECT a2.vec_id, a2.cid,
       |         list_transform(q, x -> x - $QShift) AS qu,
       |         list_sum(list_transform(q, x -> (x - $QShift) * (x - $QShift))) AS nrm
       |  FROM a2 JOIN quant USING (vec_id)),
       |pairs AS (
       |  SELECT b.vec_id AS bid,
       |         list_sum(list_transform(range(1, ${Dim + 1}),
       |                  i -> a.qu[i] * b.qu[i])) AS dot,
       |         a.nrm AS na, b.nrm AS nb
       |  FROM pr a JOIN pr b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |drops AS (
       |  SELECT DISTINCT bid FROM pairs
       |  WHERE dot > 0
       |    AND CAST(dot AS HUGEINT) * dot * $SimDen
       |        >= $SimNum * CAST(na AS HUGEINT) * nb)
       |SELECT vec_id, cid AS cluster FROM pr
       |WHERE vec_id NOT IN (SELECT bid FROM drops)
       |ORDER BY vec_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "kmeans_assign" -> kmeansAssign,
    "semdedup_prune" -> semdedupPrune,
  )
  val oracles: Map[String, String] = Map(
    "kmeans_assign" -> kmeansAssignSql,
    "semdedup_prune" -> semdedupPruneSql,
  )
}
