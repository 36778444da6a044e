package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 75 (round 11, twenty-fourth wave): covariate balance — the
  * second experiment-integrity gate. q215's SRM checks the COUNTS
  * split 50/50; this checks the USERS did: a lucky-looking assignment
  * with imbalanced pre-period behavior biases every downstream readout
  * in ways CUPED (q198) can shrink but not excuse.
  *
  *  - q230: COVARIATE BALANCE (standardized mean difference) — for
  *    each PRE-period covariate (event count, revenue cents per user):
  *    SMD = (x̄₁ − x̄₀) / s_pooled between the assignment arms, the
  *    audit-table statistic (|SMD| ≲ 0.1 is the conventional "balanced"
  *    band). All moments are EXACT Int64/BigInt — per arm (n, Σx, Σx²)
  *    from one partial+final agg, variance numerators v = n·Σx² − (Σx)²
  *    exact — and the ONLY float ops are the fixed final expression
  *    (three divisions, one add, one sqrt, one multiply, round 6 —
  *    identical tree in both engines, the q91 IEEE-exact convention).
  *    Driver closure bounded by 2 covariates × 2 arms (q198
  *    convention).
  *
  * Scale: one keyed per-user agg + one 4-row arm fold; nothing global.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation ops.
  */
object TierSeventyFive {

  import TierFour.{A0, B0, P}

  private val SplitDays = 15L

  /** Per-arm exact moments → SMD, the shared closure: takes
    * (n0, sx0, sxx0, n1, sx1, sxx1) as exact integers and performs the
    * one fixed float expression. */
  private[graft] def smd(n0: Long, sx0: Long, sxx0: Long,
      n1: Long, sx1: Long, sxx1: Long): Double = {
    val num = (BigInt(sx1) * n0 - BigInt(sx0) * n1).toDouble
    val v0 = (BigInt(n0) * sxx0 - BigInt(sx0) * sx0).toDouble
    val v1 = (BigInt(n1) * sxx1 - BigInt(sx1) * sx1).toDouble
    val meanDiff = num / (n0.toDouble * n1.toDouble)
    val pooled = math.sqrt((v0 / n0 + v1 / n1) / (n0 + n1 - 2).toDouble)
    BigDecimal(meanDiff / pooled).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  /** The per-user pre-period covariates with the assignment arm. */
  private[graft] def covariates(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    val dayIdx = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    val m = ev.agg(min(dayIdx)).collect()(0).getLong(0) // bounded 1-row scalar
    ev.groupBy("user_id")
      .agg(sum(when(dayIdx < m + SplitDays, 1L).otherwise(0L)).as("pre_n"),
        sum(when(dayIdx < m + SplitDays,
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("pre_cents"))
      .withColumn("arm", expr(s"((user_id % $P) * $A0 + $B0) % $P % 2"))
  }

  val q230 = Q("q230_covariate_balance",
    s"""WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS m FROM events),
       |u AS (
       |  SELECT user_id,
       |         ((user_id % $P) * $A0 + $B0) % $P % 2 AS arm,
       |         CAST(count(*) FILTER (epoch_us(ts) // 86400000000 < m + $SplitDays)
       |              AS BIGINT) AS pre_n,
       |         CAST(coalesce(sum(CASE WHEN epoch_us(ts) // 86400000000 < m + $SplitDays
       |                       THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END), 0)
       |              AS BIGINT) AS pre_cents
       |  FROM events CROSS JOIN d0 GROUP BY 1, 2),
       |longf AS (
       |  SELECT arm, 'pre_cents' AS covariate, pre_cents AS x FROM u
       |  UNION ALL
       |  SELECT arm, 'pre_n', pre_n FROM u),
       |sc AS (SELECT covariate, arm, CAST(count(*) AS HUGEINT) AS n,
       |              CAST(sum(x) AS HUGEINT) AS sx,
       |              CAST(sum(x * x) AS HUGEINT) AS sxx
       |       FROM longf GROUP BY 1, 2),
       |g AS (SELECT covariate,
       |             max(CASE WHEN arm = 0 THEN n END) AS n0,
       |             max(CASE WHEN arm = 1 THEN n END) AS n1,
       |             max(CASE WHEN arm = 0 THEN sx END) AS sx0,
       |             max(CASE WHEN arm = 1 THEN sx END) AS sx1,
       |             max(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
       |             max(CASE WHEN arm = 1 THEN sxx END) AS sxx1
       |      FROM sc GROUP BY 1)
       |SELECT covariate, CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
       |       round((CAST(sx1 * n0 - sx0 * n1 AS DOUBLE)
       |              / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
       |             / sqrt((CAST(n0 * sxx0 - sx0 * sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       |                     + CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |                    / CAST(n0 + n1 - 2 AS DOUBLE)), 6) AS smd
       |FROM g ORDER BY covariate""".stripMargin) { (s, dir) =>
    import s.implicits._
    val u = covariates(Tables.load(s, dir, "events"))
    val rows = Seq("pre_cents" -> "pre_cents", "pre_n" -> "pre_n").map {
      case (name, c) =>
        val m = u.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum(c).as("sx"),
            sum(col(c) * col(c)).as("sxx"))
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val (n0, sx0, sxx0) = m(0L); val (n1, sx1, sxx1) = m(1L)
        (name, n0, n1, smd(n0, sx0, sxx0, n1, sx1, sxx1))
    }
    rows.toDF("covariate", "n_a", "n_b", "smd").orderBy("covariate")
  }

  val all: Seq[Q] = Seq(q230)
}
