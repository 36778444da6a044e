package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 44 (round 10, sixteenth wave): growth accounting — the weekly
  * movement of the user base and its daily engagement ratio.
  *
  *  - q172: GROWTH ACCOUNTING — per week, the canonical user-state
  *    split: NEW (first-ever week), RETAINED (active this week and
  *    last), RESURRECTED (active this week, not last, not new) and
  *    CHURNED (active last week, not this — booked against THIS week).
  *    The four counts are the complete partition of weekly movement
  *    (new + retained + resurrected = WAU; spec-pinned), built from one
  *    distinct (user, week) frame self-joined at lag 1 plus the
  *    first-week min — three keyed set operations, no windows.
  *  - q173: STICKINESS — per day, DAU·10⁶ div MAU with MAU the exact
  *    trailing-30-day distinct count (q160's window-end expansion at
  *    ×30): the engagement-quality ratio ("what share of the monthly
  *    base shows up daily?"), all-integer.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFortyFour {

  private val WeekMs = 7L * 86400000
  private val MauDays = 30

  val q172 = Q("q172_growth_accounting",
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id, epoch_ms(ts) // $WeekMs AS wk FROM events),
       |fw AS (SELECT user_id, min(wk) AS first_wk FROM uw GROUP BY 1),
       |wks AS (SELECT DISTINCT wk FROM uw)
       |SELECT w.wk AS week,
       |       CAST(sum(CASE WHEN cur.user_id IS NOT NULL AND f.first_wk = w.wk
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |       CAST(sum(CASE WHEN cur.user_id IS NOT NULL AND prev.user_id IS NOT NULL
       |                      AND f.first_wk < w.wk THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_retained,
       |       CAST(sum(CASE WHEN cur.user_id IS NOT NULL AND prev.user_id IS NULL
       |                      AND f.first_wk < w.wk THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_resurrected,
       |       CAST(sum(CASE WHEN cur.user_id IS NULL AND prev.user_id IS NOT NULL
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
       |FROM wks w
       |CROSS JOIN fw f
       |LEFT JOIN uw cur ON cur.user_id = f.user_id AND cur.wk = w.wk
       |LEFT JOIN uw prev ON prev.user_id = f.user_id AND prev.wk = w.wk - 1
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val uw = pins(Tables.load(s, dir, "events")
      .select(col("user_id"),
        expr(s"unix_millis(cast(ts as timestamp)) div $WeekMs").as("wk"))
      .distinct())
      // pinned: feeds cur, prev (shifted) and the first-week min
    val fw = uw.groupBy("user_id").agg(min("wk").as("first_wk"))
    val wks = uw.select("wk").distinct()
    val cur = uw.select(col("user_id").as("cu"), col("wk").as("cwk"))
    val prev = uw.select(col("user_id").as("pu"), (col("wk") + 1).as("pwk"))
    val out = fw.crossJoin(broadcast(wks)) // |weeks| rows — the ×W expansion, pinned broadcast
      .join(cur, col("cu") === col("user_id") && col("cwk") === col("wk"), "left")
      .join(prev, col("pu") === col("user_id") && col("pwk") === col("wk"), "left")
      .groupBy(col("wk").as("week"))
      .agg(
        sum(when(col("cu").isNotNull && col("first_wk") === col("wk"), 1L)
          .otherwise(0L)).as("n_new"),
        sum(when(col("cu").isNotNull && col("pu").isNotNull
          && col("first_wk") < col("wk"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cu").isNotNull && col("pu").isNull
          && col("first_wk") < col("wk"), 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("cu").isNull && col("pu").isNotNull, 1L).otherwise(0L))
          .as("n_churned"))
      .orderBy("week")
    Release.onFirstExecution(out, () => pins.release())
  }

  val q173 = Q("q173_stickiness",
    s"""WITH du AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
       |evd AS (SELECT DISTINCT d AS day_idx FROM du),
       |dau AS (SELECT d AS day_idx, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
       |win AS (
       |  SELECT DISTINCT du.user_id, du.d + o.o AS day_idx
       |  FROM du CROSS JOIN (SELECT unnest(range($MauDays)) AS o) o),
       |mau AS (
       |  SELECT w.day_idx, CAST(count(DISTINCT w.user_id) AS BIGINT) AS mau
       |  FROM win w JOIN evd ON evd.day_idx = w.day_idx GROUP BY 1)
       |SELECT d.day_idx, d.dau, m.mau,
       |       (d.dau * 1000000) // m.mau AS stickiness_ppm
       |FROM dau d JOIN mau m ON m.day_idx = d.day_idx
       |ORDER BY d.day_idx""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val du = pins(Tables.load(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .distinct())
      // pinned: feeds the DAU count, the window expansion, and evd
    val evd = du.select(col("d").as("day_idx")).distinct()
    val dau = du.groupBy(col("d").as("day_idx")).agg(count(lit(1)).as("dau"))
    val mau = du.select(col("user_id"),
        explode(sequence(col("d"), col("d") + (MauDays - 1))).as("day_idx"))
      .join(evd, Seq("day_idx"), "left_semi")
      .groupBy("day_idx").agg(countDistinct("user_id").as("mau"))
    val out = dau.join(mau, "day_idx")
      .select(col("day_idx"), col("dau"), col("mau"),
        expr("(dau * 1000000) div mau").as("stickiness_ppm"))
      .orderBy("day_idx")
    Release.onFirstExecution(out, () => pins.release())
  }

  val all: Seq[Q] = Seq(q172, q173)
}
