package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 56 (round 11, fifth wave): uncertainty quantification and
  * sequential monitoring — the error bars the point readouts lack and the
  * control chart the frozen-stats tripwire can't express.
  *
  *  - q196: BRR BOOTSTRAP CI — balanced-repeated-replication variance
  *    (McCarthy 1969; Wolter, *Introduction to Variance Estimation*) for
  *    the A/B revenue uplift: 32 deterministic HALF-SAMPLES, each the
  *    users whose RE-HASHED affine key `h((h(u) + r·C) mod P)` lands odd
  *    (re-hashing decorrelates replicate membership from the arm split —
  *    the naive `h(u) + r·C` parity IS the arm bit, probed degenerate),
  *    θ_r = mean-revenue diff (centi-cents, floor) on replicate r,
  *    Var(θ̂) = Σ(θ_r − θ̂)²/R. All-integer end to end: per-replicate
  *    sums are one partial+final agg over the ×32 selector expansion
  *    (bounded, the q160 convention — map-side combine folds it to 64
  *    grid rows before the shuffle), the closure runs driver-side in
  *    BigInt over the 64-row collect (bounded read, centroid precedent),
  *    significance cross-multiplied exactly: θ² ·10⁴ > 3.8415·10⁴·Var.
  *    Every floor division has a non-negative numerator (arm sums), so
  *    Scala truncation ≡ DuckDB floor. In-plan Int64 envelope: s·100
  *    wraps past ~9·10¹⁶ cents revenue per arm-half (~10¹⁴ dollars) —
  *    the q169 DECIMAL escape applies; the BigInt closure itself has no
  *    envelope.
  *  - q197: EWMA CONTROL CHART (Roberts 1959) — per event type over the
  *    q149 daily grid, the exact-integer recurrence
  *    `e_t = (7·e_{t−1} + x_t) div 8` (α = 1/8 fixed-point, e_0 = x_0)
  *    with a relative tripwire `100·|x_t − e_{t−1}| > 20·e_{t−1}`: the
  *    SEQUENTIAL complement of q149's frozen z² stats — it adapts to
  *    drift and flags level SHIFTS, not global outliers. The integer
  *    floor each step makes the fold genuinely sequential (not
  *    prefix-sum-expressible), so it runs as a per-type mapPartitions
  *    over the GRID — (types × days) rows, calendar-bounded, tiny next
  *    to the event scan that built it; one partition per type via
  *    repartition(event_type), O(1) state per type. Envelope: 7·e + x
  *    is safe to ~1.3·10¹⁸ events per type-day.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFiftySix {

  import TierFour.{A0, B0, P}

  /** Replicate count (R). Var normalizes by R exactly. */
  private[graft] val Reps = 32
  /** Prime replicate offset, applied INSIDE the re-hash. */
  private val RepC = 1299709L
  /** q197 flag: relative deviation vs previous EWMA, percent. */
  private[graft] val EwmaK = 20L

  private[operators] def selSql =
    s"((((user_id % $P) * $A0 + $B0) % $P + r * $RepC) % $P * $A0 + $B0) % $P % 2"

  val q196 = Q("q196_ab_bootstrap",
    s"""WITH ${TierFiftyFive.armSql},
       |reps AS (SELECT unnest(range($Reps)) AS r),
       |hs AS (
       |  SELECT r, arm, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cents) AS BIGINT) AS s
       |  FROM um, reps WHERE $selSql = 1 GROUP BY 1, 2),
       |fl AS (
       |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cents) AS BIGINT) AS s
       |  FROM um GROUP BY 1),
       |th AS (
       |  SELECT r, CAST(sum(CASE WHEN arm = 1 THEN s * 100 END)
       |             // sum(CASE WHEN arm = 1 THEN n END)
       |           - sum(CASE WHEN arm = 0 THEN s * 100 END)
       |             // sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS th
       |  FROM hs GROUP BY 1),
       |t0 AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
       |         CAST(sum(CASE WHEN arm = 1 THEN s * 100 END)
       |            // sum(CASE WHEN arm = 1 THEN n END)
       |          - sum(CASE WHEN arm = 0 THEN s * 100 END)
       |            // sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS th
       |  FROM fl),
       |v AS (
       |  SELECT CAST(sum((th.th - t0.th) * (th.th - t0.th)) // $Reps AS BIGINT)
       |           AS var FROM th, t0)
       |SELECT t0.n_a, t0.n_b, t0.th AS theta_c2, v.var AS var_c2,
       |       CAST(CASE WHEN 10000 * t0.th * t0.th > 38415 * v.var
       |            THEN 1 ELSE 0 END AS BIGINT) AS significant
       |FROM t0, v""".stripMargin) { (s, dir) =>
    import s.implicits._
    val (na, nb, theta, varC2, sig) = brrFromUm(TierFiftyFive.armRevenue(s, dir))
    Seq((na, nb, theta, varC2, sig))
      .toDF("n_a", "n_b", "theta_c2", "var_c2", "significant")
  }

  /** The full BRR pipeline over a per-user (user_id, arm, cents) frame:
    * ×R selector expansion → 64-row grid + 2-row full-sample agg
    * (bounded collects) → [[brrReport]]. The q200 capstone shares this
    * exact path with q196. */
  private[graft] def brrFromUm(um: DataFrame): (Long, Long, Long, Long, Long) = {
    val s = um.sparkSession
    import s.implicits._
    val reps = s.range(0, Reps).toDF("r")
    val hs = um.crossJoin(broadcast(reps))
      .where(expr(s"$selSql = 1"))
      .groupBy("r", "arm")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fl = um.groupBy("arm").agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    brrReport(fl.toSeq, hs.toSeq)
  }

  /** Driver-side BigInt closure of the BRR report over the bounded grids:
    * `full` = (arm, n, s) ×2, `hs` = (r, arm, n, s) ×2R. Returns
    * (n_a, n_b, θ centi-cents, Var(θ̂) = Σ(θ_r−θ̂)²/R, significance bit).
    * Every divided numerator is non-negative, so `/` ≡ floor. */
  private[graft] def brrReport(full: Seq[(Long, Long, Long)],
      hs: Seq[(Long, Long, Long, Long)]): (Long, Long, Long, Long, Long) = {
    def mean(s: BigInt, n: BigInt): BigInt = s * 100 / n
    val fm = full.map { case (a, n, s) => a -> ((BigInt(n), BigInt(s))) }.toMap
    val theta = mean(fm(1L)._2, fm(1L)._1) - mean(fm(0L)._2, fm(0L)._1)
    val byRep = hs.groupBy(_._1)
    val varC2 = byRep.valuesIterator.map { cells =>
      val cm = cells.map { case (_, a, n, s) => a -> ((BigInt(n), BigInt(s))) }.toMap
      val thr = mean(cm(1L)._2, cm(1L)._1) - mean(cm(0L)._2, cm(0L)._1)
      val d = thr - theta
      d * d
    }.sum / Reps
    val sig = if (BigInt(10000) * theta * theta > BigInt(38415) * varC2) 1L else 0L
    (fm(0L)._1.toLong, fm(1L)._1.toLong, theta.toLong, varC2.toLong, sig)
  }

  val q197 = Q("q197_ewma_chart",
    s"""WITH RECURSIVE dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY epoch_us(ts) // 86400000000) AS rn
       |  FROM events GROUP BY 1, 2),
       |rec AS (
       |  SELECT event_type, rn, day_idx, cnt, cnt AS ewma,
       |         CAST(-1 AS BIGINT) AS prev
       |  FROM dc WHERE rn = 1
       |  UNION ALL
       |  SELECT d.event_type, d.rn, d.day_idx, d.cnt,
       |         (7 * r.ewma + d.cnt) // 8, r.ewma
       |  FROM rec r JOIN dc d
       |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
       |SELECT event_type, day_idx, cnt, CAST(ewma AS BIGINT) AS ewma,
       |       CAST(CASE WHEN rn > 1 AND 100 * abs(cnt - prev) > $EwmaK * prev
       |            THEN 1 ELSE 0 END AS BIGINT) AS flag
       |FROM rec ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    ewmaChart(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
      .orderBy("event_type", "day_idx")
  }

  /** THE chart step — one definition for batch q197 and the s40 live
    * monitor (they must never drift). `(first, prevEwma, cnt)` →
    * `(newEwma, flag)`: first observation initializes (no flag); after
    * that `e = (7·e + x) div 8` (both terms non-negative — truncation ≡
    * floor) and the relative tripwire compares against the PRE-update
    * EWMA. */
  private[graft] def ewmaStep(first: Boolean, prev: Long, c: Long): (Long, Long) = {
    val e = if (first) c else (7 * prev + c) / 8
    val flag =
      if (!first && 100L * math.abs(c - prev) > EwmaK * prev) 1L else 0L
    (e, flag)
  }

  /** The sequential EWMA fold over a (event_type, day_idx, cnt) grid:
    * one partition per type, sorted days, O(1) carried state. */
  private[graft] def ewmaChart(dc: DataFrame): DataFrame = {
    val s = dc.sparkSession
    import s.implicits._
    dc.select(col("event_type").cast("string"), col("day_idx").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .repartition(col("event_type"))
      .sortWithinPartitions("event_type", "day_idx")
      .mapPartitions { it =>
        var curType: String = null
        var prev = 0L
        it.map { case (t, d, c) =>
          val (e, flag) = ewmaStep(t != curType, prev, c)
          curType = t
          prev = e
          (t, d, c, e, flag)
        }
      }
      .toDF("event_type", "day_idx", "cnt", "ewma", "flag")
  }

  val all: Seq[Q] = Seq(q196, q197)
}
