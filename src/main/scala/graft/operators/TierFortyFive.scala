package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 45 (round 10, seventeenth wave): SEASONALITY — the day-of-week
  * structure q149's flat tripwire ignores.
  *
  *  - q174: SEASONALITY PROFILE — per (event type, day-of-week), the
  *    share of the type's volume that lands on that weekday (ppm of
  *    the type total, all-integer): the weekly rhythm table ("signups
  *    dip 40 % on weekends") that calibrates staffing, alerting and
  *    the q175 stratified tripwire. dow = (epoch_day + 4) mod 7
  *    (1970-01-01 was a Thursday; 0 = Sunday — identical arithmetic on
  *    both engines, no locale-dependent date functions).
  *  - q175: SEASONALITY-ADJUSTED ANOMALY — q149's exact integer
  *    z-square test run WITHIN each (type, day-of-week) stratum:
  *    a quiet Sunday is compared against SUNDAYS, so weekly rhythm
  *    stops masking real anomalies and stops firing false ones. The
  *    cut is k = 1.5 (cross-multiplied `4·(n·x−S)² > 9·(n·SS−S²)` —
  *    still pure Int64), NOT q149's 2: the population z² is bounded by
  *    n−1, so with a 30-day window's n≈4 days per stratum a 2σ flag is
  *    mathematically IMPOSSIBLE — the bound every stratified tripwire
  *    must respect when it shrinks its reference set.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star monitoring ops.
  */
object TierFortyFive {


  val q174 = Q("q174_dow_profile",
    """WITH dc AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |dw AS (
      |  SELECT event_type, (d + 4) % 7 AS dow, CAST(sum(cnt) AS BIGINT) AS s
      |  FROM dc GROUP BY 1, 2),
      |tt AS (SELECT event_type, CAST(sum(s) AS BIGINT) AS tot FROM dw GROUP BY 1)
      |SELECT dw.event_type, dw.dow, dw.s AS n_events,
      |       (dw.s * 1000000) // tt.tot AS share_ppm
      |FROM dw JOIN tt ON tt.event_type = dw.event_type
      |ORDER BY dw.event_type, dw.dow""".stripMargin) { (s, dir) =>
    val dc = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .agg(count(lit(1)).as("cnt"))
    val dw = dc.groupBy(col("event_type"), expr("(d + 4) % 7").as("dow"))
      .agg(sum("cnt").as("s"))
    val tt = dw.groupBy(col("event_type").as("et")).agg(sum("s").as("tot"))
    dw.join(tt, col("et") === col("event_type"))
      .select(col("event_type"), col("dow"), col("s").as("n_events"),
        expr("(s * 1000000) div tot").as("share_ppm"))
      .orderBy("event_type", "dow")
  }

  val q175 = Q("q175_seasonal_anomaly",
    s"""WITH dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, (day_idx + 4) % 7 AS dow,
       |         CAST(count(*) AS BIGINT) AS n,
       |         sum(cnt) AS s, sum(cnt * cnt) AS ss
       |  FROM dc GROUP BY 1, 2)
       |SELECT dc.event_type, dc.day_idx, dc.cnt
       |FROM dc JOIN st ON st.event_type = dc.event_type
       |               AND st.dow = (dc.day_idx + 4) % 7
       |WHERE 4 * (n * cnt - s) * (n * cnt - s) > 9 * (n * ss - s * s)
       |ORDER BY dc.event_type, dc.day_idx""".stripMargin) { (s, dir) =>
    val dc = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("cnt"))
    val st = dc.groupBy(col("event_type").as("et"),
        expr("(day_idx + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
    dc.join(st, col("et") === col("event_type")
        && col("dow") === expr("(day_idx + 4) % 7"))
      .filter(lit(4L) * (col("n") * col("cnt") - col("s"))
          * (col("n") * col("cnt") - col("s"))
        > lit(9L) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("event_type"), col("day_idx"), col("cnt"))
      .orderBy("event_type", "day_idx")
  }

  val all: Seq[Q] = Seq(q174, q175)
}
