package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 38 (round 10, tenth wave): the monitoring dashboard closers —
  * exact sliding-window engagement and robust outliers.
  *
  *  - q160: ROLLING 7-DAY ACTIVE USERS — per event day, EXACT distinct
  *    users active in the trailing [d−6, d] window. Distinct-over-
  *    sliding-window doesn't decompose into windowed sums, so the
  *    scale-honest exact form EXPANDS: each distinct (user, day) row
  *    contributes to the 7 window-ends it falls in (a fixed ×7 row
  *    multiplication — the window length, not the data, bounds it),
  *    then one (day, user) distinct count. The sketch alternative
  *    (per-day HLL registers + 7-way merge, s20's machinery) is the
  *    documented approximate path when ×7 is too wide.
  *  - q161: MAD VOLUME OUTLIERS — |cnt − median| > 3·MAD per event
  *    type: the ROBUST twin of q149's z-score (one wild day inflates a
  *    mean and its σ enough to hide itself; the median and MAD don't
  *    move). Medians via the q140 percentile ≡ quantile_cont
  *    convention; integer counts make every median/MAD a half-integer —
  *    exactly representable, so the comparison needs no rounding.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star monitoring ops.
  */
object TierThirtyEight {

  private val WinDays = 7
  private val MadK = 3

  val q160 = Q("q160_rolling_active",
    s"""WITH du AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
       |  FROM events),
       |evd AS (SELECT DISTINCT d AS day_idx FROM du),
       |win AS (
       |  SELECT DISTINCT du.user_id, du.d + o.o AS day_idx
       |  FROM du CROSS JOIN (SELECT unnest(range(${WinDays})) AS o) o)
       |SELECT w.day_idx, CAST(count(DISTINCT w.user_id) AS BIGINT) AS active_7d
       |FROM win w JOIN evd ON evd.day_idx = w.day_idx
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val du = Tables.load(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .distinct()
    val evd = du.select(col("d").as("day_idx")).distinct()
    du.select(col("user_id"),
        explode(sequence(col("d"), col("d") + (WinDays - 1))).as("day_idx"))
      .join(evd, Seq("day_idx"), "left_semi")
      .groupBy("day_idx")
      .agg(countDistinct("user_id").as("active_7d"))
      .orderBy("day_idx")
  }

  val q161 = Q("q161_mad_outliers",
    s"""WITH dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, quantile_cont(CAST(cnt AS DOUBLE), 0.5) AS med
       |  FROM dc GROUP BY 1),
       |ad AS (
       |  SELECT dc.event_type, dc.day_idx, dc.cnt, abs(dc.cnt - st.med) AS dev
       |  FROM dc JOIN st ON st.event_type = dc.event_type),
       |md AS (
       |  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM ad GROUP BY 1)
       |SELECT ad.event_type, ad.day_idx, ad.cnt
       |FROM ad JOIN md ON md.event_type = ad.event_type
       |WHERE ad.dev > $MadK * md.mad
       |ORDER BY ad.event_type, ad.day_idx""".stripMargin) { (s, dir) =>
    val dc = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("cnt"))
    val st = dc.groupBy(col("event_type").as("et1"))
      .agg(expr("percentile(CAST(cnt AS DOUBLE), 0.5)").as("med"))
    val ad = dc.join(st, col("event_type") === col("et1"))
      .select(col("event_type"), col("day_idx"), col("cnt"),
        abs(col("cnt") - col("med")).as("dev"))
    val md = ad.groupBy(col("event_type").as("et2"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    ad.join(md, col("event_type") === col("et2"))
      .filter(col("dev") > lit(MadK) * col("mad"))
      .select(col("event_type"), col("day_idx"), col("cnt"))
      .orderBy("event_type", "day_idx")
  }

  val all: Seq[Q] = Seq(q160, q161)
}
