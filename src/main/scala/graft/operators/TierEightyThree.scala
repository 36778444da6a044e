package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 83 (round 13): temporal dependence diagnostics — does today
  * predict tomorrow, and does one stream lead another?
  *
  *  - q245: AUTOCORRELATION FUNCTION — per event_type, lag-1..7
  *    autocorrelation of the daily count series in exact-integer ppm.
  *    Deviations use the FROZEN full-series mean cleared of division:
  *    `dev_t = n·x_t − S` (so num and den both carry the n² factor and
  *    it cancels); `acf_ppm = 10⁶·Σ dev_t·dev_{t+k} // Σ dev_t²` —
  *    truncating division both engines (the q198 rule; the numerator
  *    goes NEGATIVE on anti-correlated lags, spec-pinned live). The
  *    memory a forecaster (q183/q237) exploits, measured directly.
  *  - q246: LEAD-LAG CROSS-CORRELATION — click (x) vs purchase (y)
  *    daily counts at lags −3..+3: Pearson ppm over the overlap window
  *    with both series' full-30-day frozen means,
  *    `ccf_ppm = ⌊num·10⁶ / √(denx·deny)⌋` — sqrt and the double
  *    mul/div are IEEE-identical cross-engine (the FIXTURES.md float
  *    rule: +,*,/ and sqrt are safe; only libm ln/exp/log are not).
  *    Positive peak at lag 0 with symmetric decay on this fixture
  *    (spec-pinned); in production the argmax lag is the
  *    click-leads-purchase delay estimate.
  *
  * Scale: both are folds over the (event_type, day) count grid — one
  * shuffle to the grid, then per-type scalar folds and a ≤ |lags|·days
  * self-join keyed on (type, day); the grid is metadata-sized relative
  * to the event table at any SF. Int64 envelope: dev ≤ n·max_cnt, so
  * num·10⁶ ≤ n³·max_cnt²·10⁶ // … wraps past ~10⁵ events/day at n=30
  * days — route dev products through DECIMAL(38,0) beyond that (the
  * q149 escape), ranks unchanged.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star time-series ops.
  */
object TierEightyThree {

  private[graft] val AcfMaxLag = 7

  val q245 = Q("q245_acf",
    s"""WITH dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(c) AS BIGINT) AS s
       |       FROM dc GROUP BY 1),
       |dev AS (SELECT dc.event_type, dc.d, dc.c * st.n - st.s AS dv
       |        FROM dc JOIN st USING (event_type)),
       |den AS (SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS dd
       |        FROM dev GROUP BY 1),
       |lags AS (SELECT unnest(range(1, ${AcfMaxLag + 1})) AS lag)
       |SELECT x.event_type, CAST(lags.lag AS BIGINT) AS lag,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(CASE WHEN den.dd = 0 THEN 0
       |            ELSE sum(x.dv * y.dv) * 1000000 // den.dd END AS BIGINT)
       |         AS acf_ppm
       |FROM dev x CROSS JOIN lags
       |JOIN dev y ON y.event_type = x.event_type AND y.d = x.d + lags.lag
       |JOIN den ON den.event_type = x.event_type
       |GROUP BY 1, 2, den.dd
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    acfChart(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
  }

  /** q245's ACF fold over ANY `(event_type, day_idx, cnt)` grid — the
    * extracted library face (`graft_acf` SQL twin; the
    * ewma/cusum/holt chart-family convention). */
  private[graft] def acfChart(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    val dc = grid
      .select(col("event_type"), col("day_idx").cast("long").as("d"),
        col("cnt").cast("long").as("c"))
    val st = dc.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"))
    val dev = dc.join(broadcast(st), "event_type")
      .select(col("event_type"), col("d"), (col("c") * col("n") - col("s")).as("dv"))
    val den = dev.groupBy("event_type").agg(sum(col("dv") * col("dv")).as("dd"))
    val lags = s.range(1, AcfMaxLag + 1).select(col("id").as("lag"))
    dev.as("x").crossJoin(broadcast(lags))
      .join(dev.as("y"),
        col("y.event_type") === col("x.event_type") &&
          col("y.d") === col("x.d") + col("lag"))
      .join(broadcast(den).as("den"), col("den.event_type") === col("x.event_type"))
      .groupBy(col("x.event_type").as("event_type"), col("lag"), col("dd"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x.dv") * col("y.dv")).as("num"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        // a CONSTANT series has zero variance — no autocorrelation signal;
        // report 0 instead of dividing by zero (reachable via graft_acf)
        expr("CASE WHEN dd = 0 THEN CAST(0 AS BIGINT)"
          + " ELSE (num * 1000000) div dd END").as("acf_ppm"))
      .orderBy("event_type", "lag")
  }

  val q246 = Q("q246_lead_lag",
    s"""WITH dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
       |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(c) AS BIGINT) AS s
       |       FROM dc GROUP BY 1),
       |dev AS (SELECT dc.event_type, dc.d, dc.c * st.n - st.s AS dv
       |        FROM dc JOIN st USING (event_type)),
       |den AS (SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS dd
       |        FROM dev GROUP BY 1),
       |lags AS (SELECT unnest(range(-3, 4)) AS lag)
       |SELECT CAST(lags.lag AS BIGINT) AS lag,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(floor(CAST(sum(x.dv * y.dv) AS DOUBLE) * 1000000 /
       |                  sqrt(CAST(dx.dd AS DOUBLE) * CAST(dy.dd AS DOUBLE)))
       |         AS BIGINT) AS ccf_ppm
       |FROM dev x CROSS JOIN lags
       |JOIN dev y ON y.event_type = 'purchase' AND y.d = x.d + lags.lag
       |JOIN den dx ON dx.event_type = 'click'
       |JOIN den dy ON dy.event_type = 'purchase'
       |WHERE x.event_type = 'click'
       |GROUP BY 1, dx.dd, dy.dd
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    val dc = TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events"))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("day_idx").as("d"), col("cnt").as("c"))
    val st = dc.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"))
    val dev = dc.join(broadcast(st), "event_type")
      .select(col("event_type"), col("d"), (col("c") * col("n") - col("s")).as("dv"))
    val den = dev.groupBy("event_type").agg(sum(col("dv") * col("dv")).as("dd"))
    val lags = s.range(-3, 4).select(col("id").as("lag"))
    dev.filter(col("event_type") === "click").as("x")
      .crossJoin(broadcast(lags))
      .join(dev.filter(col("event_type") === "purchase").as("y"),
        col("y.d") === col("x.d") + col("lag"))
      .crossJoin(broadcast(den.filter(col("event_type") === "click")
        .select(col("dd").as("ddx"))))
      .crossJoin(broadcast(den.filter(col("event_type") === "purchase")
        .select(col("dd").as("ddy"))))
      .groupBy(col("lag"), col("ddx"), col("ddy"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x.dv") * col("y.dv")).as("num"))
      .select(col("lag"), col("n_pairs"),
        floor(col("num").cast("double") * 1000000d /
          sqrt(col("ddx").cast("double") * col("ddy").cast("double")))
          .cast("long").as("ccf_ppm"))
      .orderBy("lag")
  }

  val all: Seq[Q] = Seq(q245, q246)
}
