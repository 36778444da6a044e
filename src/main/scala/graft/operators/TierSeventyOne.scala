package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 71 (round 11, twentieth wave): silence episodes — the batch
  * face of inactivity detection; its push twin is the event-time-TIMER
  * stream [[graft.streaming.SilenceMonitor]] (s43).
  *
  *  - q225: SILENCE EPISODES — per user every maximal interior run of
  *    ≥ 2 fully-silent days between two active days: (user, first
  *    silent day, run length) via one `lead` over the per-user ordered
  *    distinct-day frame (gaps-and-islands, the q89 span machinery's
  *    calendar edition; 40 episodes at sf0.01 / 7 at sf0.001 —
  *    probed). The dormancy/churn-risk input: which users go dark, for
  *    how long, how often. Retrospective by construction — the LIVE
  *    complement that fires AT the moment of proven silence is s43's
  *    timer stream, the one detection no input-driven operator can do
  *    (the trigger is the absence of data).
  *
  * Scale: one distinct + one per-user keyed window (bounded per key),
  * nothing global.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierSeventyOne {

  /** Minimum fully-silent days for an episode. */
  private[graft] val MinGapDays = 2L

  val q225 = Q("q225_silence_episodes",
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
       |  FROM events),
       |g AS (SELECT user_id, d,
       |             lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
       |      FROM ud)
       |SELECT user_id, CAST(d + 1 AS BIGINT) AS silent_from,
       |       CAST(nd - d - 1 AS BIGINT) AS silent_days
       |FROM g WHERE nd IS NOT NULL AND nd - d - 1 >= $MinGapDays
       |ORDER BY user_id, silent_from""".stripMargin) { (s, dir) =>
    val ud = Tables.load(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    ud.withColumn("nd", lead("d", 1).over(w))
      .filter(col("nd").isNotNull &&
        col("nd") - col("d") - 1 >= MinGapDays)
      .select(col("user_id"), (col("d") + 1).as("silent_from"),
        (col("nd") - col("d") - 1).as("silent_days"))
      .orderBy("user_id", "silent_from")
  }

  val all: Seq[Q] = Seq(q225)
}
