package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 47 (round 10, nineteenth wave): lifetime-shape analytics — how
  * long users stay, and at what cadence they come back.
  *
  *  - q178: SURVIVAL CURVE — discrete retention-as-survival: S(d) =
  *    share of the cohort whose LAST activity lands ≥ d days after
  *    their first (right-censored by the fixture window — stated, not
  *    hidden). Non-increasing by construction; the churn-model view
  *    q88's activity grid doesn't give (active-at-d counts dips and
  *    returns; survival asks who is still ALIVE at d). One per-user
  *    min/max fold + one |days|-sized expansion + one fold, all-integer
  *    ppm.
  *  - q179: REPEAT-PURCHASE CADENCE — the distribution of gaps between
  *    a user's consecutive purchases in whole-day buckets, plus the
  *    repeat rate: the "when do buyers come back" table behind CRM
  *    timing. Per-user lag over (ts, event_id) — keyed window, the
  *    q138 discipline.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFortySeven {

  private val DayUs = 86400000000L

  val q178 = Q("q178_survival_curve",
    s"""WITH ue AS (
       |  SELECT user_id,
       |         (epoch_us(max(ts)) - epoch_us(min(ts))) // $DayUs AS life_d
       |  FROM events GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS cohort FROM ue),
       |offs AS (SELECT DISTINCT life_d AS d FROM ue UNION SELECT 0),
       |s AS (
       |  SELECT o.d,
       |         CAST(sum(CASE WHEN ue.life_d >= o.d THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_alive
       |  FROM offs o CROSS JOIN ue GROUP BY 1)
       |SELECT s.d AS day_offset, s.n_alive,
       |       (s.n_alive * 1000000) // n.cohort AS survival_ppm
       |FROM s, n ORDER BY s.d""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val ue = pins(Tables.load(s, dir, "events")
      .groupBy("user_id")
      .agg(expr(s"(unix_micros(CAST(max(ts) AS TIMESTAMP))"
        + s" - unix_micros(CAST(min(ts) AS TIMESTAMP))) div $DayUs").as("life_d")))
      // pinned: feeds the offset set, the cohort count, and the fold
    val cohort = ue.count() // documented 1-long driver read
    val offs = ue.select(col("life_d").as("d")).union(s.range(1).select(lit(0L).as("d")))
      .distinct()
    val out = ue.crossJoin(broadcast(offs)) // |distinct lifetimes| ≤ |days| — bounded expansion
      .groupBy("d")
      .agg(sum(when(col("life_d") >= col("d"), 1L).otherwise(0L)).as("n_alive"))
      .select(col("d").as("day_offset"), col("n_alive"),
        expr(s"(n_alive * 1000000) div $cohort").as("survival_ppm"))
      .orderBy("day_offset")
    Release.onFirstExecution(out, () => pins.release())
  }

  val q179 = Q("q179_repeat_cadence",
    s"""WITH p AS (
       |  SELECT user_id, ts, event_id,
       |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events WHERE event_type = 'purchase'),
       |g AS (
       |  SELECT (epoch_us(ts) - epoch_us(prev)) // $DayUs AS gap_d
       |  FROM p WHERE prev IS NOT NULL)
       |SELECT gap_d, CAST(count(*) AS BIGINT) AS n_gaps
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("prev").isNotNull)
      .select(expr(s"(unix_micros(CAST(ts AS TIMESTAMP))"
        + s" - unix_micros(CAST(prev AS TIMESTAMP))) div $DayUs").as("gap_d"))
      .groupBy("gap_d").agg(count(lit(1)).as("n_gaps"))
      .orderBy("gap_d")
  }

  val all: Seq[Q] = Seq(q178, q179)
}
