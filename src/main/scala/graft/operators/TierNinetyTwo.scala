package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 92 (round 13): forecast-quality and time-to-event readouts over
  * the event stream.
  *
  *  - q263: SEASONAL-NAIVE BACKTEST (the MASE scale of Hyndman &
  *    Koehler 2006) — per event type over the daily grid: the weekly
  *    seasonal-naive forecast x̂_t = x_{t−7} scored against the
  *    one-step naive x̂_t = x_{t−1} on their COMMON support (t ≥ 8),
  *    as `mase_ppm = 10⁶·Σ|x_t − x_{t−7}| // Σ|x_t − x_{t−1}|` — all
  *    integer (absolute differences of counts; one truncating
  *    division). Under 10⁶ means the weekly rhythm q174 profiles
  *    genuinely predicts; the gate for "is dow-seasonal alerting worth
  *    deploying on this type". Lags come from equi-joins on the dense
  *    daily grid (day−1, day−7), never a window.
  *  - q264: DISCRETE-TIME HAZARD TABLE — the instantaneous-risk
  *    companion of q178's survival curve: for days-since-signup
  *    d = 0..13, `hazard(d) = events(d) / at_risk(d)` where events(d)
  *    counts users whose FIRST purchase lands exactly d days after
  *    their first signup and at_risk(d) counts users still
  *    unconverted AND still observable at d (right-censored at the
  *    corpus horizon — users whose window ends before d leave the
  *    denominator, the Kaplan–Meier discipline). Per-user min
  *    aggregates + one broadcast 14-row grid join; exact ppm.
  *
  * Scale: q263 is the daily grid joined to itself twice on (type,
  * day−k) — metadata-scale at any horizon. q264 is two keyed min
  * aggregates over events and a broadcast grid cross — one shuffle on
  * user_id.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star monitoring /
  * product-analytics ops.
  */
object TierNinetyTwo {

  /** Hazard-table horizon (days since signup). */
  private[graft] val HazardDays = 14L

  /** q263's fold over ANY `(event_type, day_idx, cnt)` grid — the
    * extracted library face. Output per type:
    * `(event_type, n_eval, sae_seasonal, sae_naive, mase_ppm)`;
    * a zero naive denominator (a perfectly constant series) is
    * DECLARED mase_ppm = 10⁶ (the two forecasts tie at zero error). */
  private[graft] def maseOver(dc: DataFrame): DataFrame = {
    val x = dc.select(col("event_type"), col("day_idx"), col("cnt"))
    val l1 = dc.select(col("event_type").as("et1"),
      (col("day_idx") + 1).as("d1"), col("cnt").as("c1"))
    val l7 = dc.select(col("event_type").as("et7"),
      (col("day_idx") + 7).as("d7"), col("cnt").as("c7"))
    x.join(l1, col("event_type") === col("et1") && col("day_idx") === col("d1"))
      .join(l7, col("event_type") === col("et7") && col("day_idx") === col("d7"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("cnt") - col("c7"))).as("sae_seasonal"),
        sum(abs(col("cnt") - col("c1"))).as("sae_naive"))
      .select(col("event_type"), col("n_eval"), col("sae_seasonal"),
        col("sae_naive"),
        when(col("sae_naive") === 0, lit(1000000L))
          .otherwise(expr("(1000000 * sae_seasonal) div sae_naive"))
          .as("mase_ppm"))
      .orderBy("event_type")
  }

  val q263 = Q("q263_mase_backtest",
    """WITH dc AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT x.event_type, x.cnt, l1.cnt AS c1, l7.cnt AS c7
      |  FROM dc x
      |  JOIN dc l1 ON l1.event_type = x.event_type
      |            AND l1.day_idx = x.day_idx - 1
      |  JOIN dc l7 ON l7.event_type = x.event_type
      |            AND l7.day_idx = x.day_idx - 7),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
      |         CAST(sum(abs(cnt - c7)) AS BIGINT) AS sae_seasonal,
      |         CAST(sum(abs(cnt - c1)) AS BIGINT) AS sae_naive
      |  FROM j GROUP BY 1)
      |SELECT event_type, n_eval, sae_seasonal, sae_naive,
      |       CAST(CASE WHEN sae_naive = 0 THEN 1000000
      |            ELSE (1000000 * sae_seasonal) // sae_naive END AS BIGINT)
      |         AS mase_ppm
      |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
    maseOver(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
  }

  val q264 = Q("q264_hazard_table",
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |         epoch_us(ts) // 86400000000 AS d
       |  FROM events),
       |h AS (SELECT max(d) AS t FROM e),
       |su AS (SELECT user_id, min(d) AS s FROM e
       |       WHERE event_type = 'signup' GROUP BY 1),
       |pu AS (
       |  SELECT e.user_id, min(e.d) AS p
       |  FROM e JOIN su ON su.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.d >= su.s GROUP BY 1),
       |u AS (
       |  SELECT su.user_id, pu.p - su.s AS de, h.t - su.s AS cens
       |  FROM su LEFT JOIN pu ON pu.user_id = su.user_id CROSS JOIN h),
       |grid AS (SELECT unnest(range(0, $HazardDays)) AS d),
       |hz AS (
       |  SELECT g.d,
       |         CAST(sum(CASE WHEN (u.de IS NULL OR u.de >= g.d)
       |                        AND u.cens >= g.d THEN 1 ELSE 0 END) AS BIGINT)
       |           AS at_risk,
       |         CAST(sum(CASE WHEN u.de = g.d THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_events
       |  FROM grid g CROSS JOIN u GROUP BY 1)
       |SELECT CAST(d AS BIGINT) AS d, at_risk, n_events,
       |       CAST((1000000 * n_events) // at_risk AS BIGINT) AS hazard_ppm
       |FROM hz WHERE at_risk > 0 ORDER BY d""".stripMargin) { (s, dir) =>
    hazardOver(Tables.load(s, dir, "events"), "signup", "purchase", HazardDays)
  }

  /** q264's table over ANY `(user_id, event_type, ts)` frame with
    * arbitrary start/goal steps — the extracted library face. First
    * goal at-or-after first start; right-censoring at the frame's max
    * day; rows only where someone is still at risk. */
  private[graft] def hazardOver(events: DataFrame, start: String, goal: String,
      days: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
    val horizon = e.agg(max("d").as("t"))
    val su = e.filter(col("event_type") === start)
      .groupBy("user_id").agg(min("d").as("s"))
    val pu = e.filter(col("event_type") === goal)
      .join(su, "user_id").filter(col("d") >= col("s"))
      .groupBy(col("user_id").as("uid_p")).agg(min("d").as("p"))
    val u = su.join(pu, col("user_id") === col("uid_p"), "left")
      .crossJoin(broadcast(horizon))
      .select((col("p") - col("s")).as("de"), (col("t") - col("s")).as("cens"))
    val grid = broadcast((0L until days).toDF("d"))
    grid.join(u, lit(true))
      .groupBy("d")
      .agg(sum(when((col("de").isNull || col("de") >= col("d"))
          && col("cens") >= col("d"), 1L).otherwise(0L)).as("at_risk"),
        sum(when(col("de") === col("d"), 1L).otherwise(0L)).as("n_events"))
      .filter(col("at_risk") > 0)
      .select(col("d"), col("at_risk"), col("n_events"),
        expr("(1000000 * n_events) div at_risk").as("hazard_ppm"))
      .orderBy("d")
  }

  val all: Seq[Q] = Seq(q263, q264)
}
