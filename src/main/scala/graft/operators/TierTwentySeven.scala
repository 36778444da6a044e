package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 27 (round 8, twentieth wave): temporal state modeling — the
  * event-sourced SCD-style history table and its point-in-time lookup,
  * the warehouse capability (slowly-changing dimensions / time travel)
  * the inventory still lacked.
  *
  *  - q138: STATE HISTORY — fold each user's event stream into versioned
  *    state rows `(valid_from, valid_to, is_current)` (SCD type-2 shape:
  *    every change closes the previous version and opens a new one).
  *  - q139: STATE AS-OF — the state in effect for every user at one
  *    fixed instant, read from q138's interval table: the time-travel
  *    point query an auditor runs ("what did we believe on Jan 15?").
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star breadth ops.
  */
object TierTwentySeven {

  /** Shared oracle CTE `h` — q138's history rows: per user, events in
    * (ts, event_id) order; each event's value is valid until the next
    * event (NULL valid_to = still current). `value` rides as integer
    * cents (the Determinism rule: money never sums as DOUBLE). */
  private val historySql: String =
    """h AS (
      |  SELECT user_id, ts AS valid_from,
      |         lead(ts) OVER w AS valid_to,
      |         CAST(floor(value * 100) AS BIGINT) AS value_cents,
      |         CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin

  /** Engine-side history frame (q138's rows, unordered). The per-user
    * `lead` window partitions on user_id — keyed state, one shuffle, no
    * global ordering anywhere (q36's session discipline); a user's
    * history length is their event count, the same envelope as any
    * per-key window. */
  private[operators] def history(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("value_cents"))
      .select(col("user_id"), col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        col("value_cents"),
        when(lead(col("ts"), 1).over(w).isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** SCD-2 state history: one versioned row per event, each valid from
    * its own timestamp until the user's next event (open-ended for the
    * latest). The event-to-state fold behind audit tables and time
    * travel; `Σ is_current = |users|` by construction (spec law).
    */
  val q138 = Q("q138_scd_history",
    s"""WITH $historySql
       |SELECT user_id, valid_from, valid_to, value_cents,
       |       CAST(is_current AS BIGINT) AS is_current
       |FROM h ORDER BY user_id, valid_from""".stripMargin) { (s, dir) =>
    history(s, dir)
      .select(col("user_id"), col("valid_from"), col("valid_to"),
        col("value_cents"), col("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** Time-travel point query: every user's state in effect at the fixed
    * audit instant (half-open validity `[from, to)`; users whose first
    * event is later are absent). One filter over q138's interval table —
    * at scale the history is range-partitioned by valid_from, so the
    * instant prunes partitions before anything scans.
    */
  val q139 = Q("q139_state_asof",
    s"""WITH $historySql
       |SELECT user_id, valid_from, value_cents
       |FROM h
       |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
       |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
       |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val at = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    history(s, dir)
      .filter(col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
      .select(col("user_id"), col("valid_from"), col("value_cents"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(q138, q139)
}
