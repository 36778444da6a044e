package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 25 (round 8, eighteenth wave): sequence mining over the event
  * stream — what users DO, in order, inside a session. Completes the
  * events family (q36 sessions, q81 funnel, q88 retention) with the
  * transition-level view.
  *
  *  - q134: SESSION PATHS — the top within-session event-type
  *    transitions (consecutive pairs in (ts, event_id) order under q36's
  *    6-hour-gap sessionization): the "common navigation paths" report.
  *  - q135: MARKOV NEXT-ACTION — per event type, its most likely
  *    within-session successor with the transition probability in
  *    integer ppm: the first-order behavior model a product team reads
  *    (and the events-side twin of q57's token bigram LM).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star breadth ops.
  */
object TierTwentyFive {

  /** Shared oracle CTE chain ending in `p(et_a, et_b)` — one row per
    * within-session consecutive transition (q36's gaps-and-islands
    * sessionization restated with the (ts, event_id) total order). */
  private val pathSql: String =
    """o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
      |  FROM o),
      |p AS (
      |  SELECT et_a, et_b FROM (
      |    SELECT event_type AS et_a,
      |           lead(event_type) OVER (PARTITION BY user_id, sess
      |                                  ORDER BY ts, event_id) AS et_b
      |    FROM s)
      |  WHERE et_b IS NOT NULL)""".stripMargin

  /** Engine-side transition frame `(et_a, et_b)` — one row per
    * within-session consecutive pair. Sessionization is the built-in
    * `session_window` (q36's operator); the in-session sequence
    * materializes per session via sort_array(collect_list) — state
    * bounded by session length (an always-on key needs a session cap
    * upstream; the gap guarantees finite sessions for human traffic),
    * and the ONLY shuffle is the session groupBy on user_id. */
  private def transitions(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("seq"))
      .filter(size(col("seq")) >= 2) // single-event session has no transition
      .select(explode(expr(
        "transform(slice(seq, 1, size(seq) - 1)," +
          " (x, i) -> struct(x.event_type AS et_a," +
          " element_at(seq, i + 2).event_type AS et_b))")).as("p"))
      .select(col("p.et_a").as("et_a"), col("p.et_b").as("et_b"))

  /** Top-20 within-session event-type transitions — count desc, ties
    * pinned (et_a, et_b).
    *
    * Scale: sessionize (one user_id shuffle), pair-count (one (a,b)
    * shuffle — the key space is |event types|², tiny), TakeOrdered. The
    * per-session collect_list is bounded by session length — the same
    * envelope as the built-in session aggregation itself.
    */
  val q134 = Q("q134_session_paths",
    s"""WITH $pathSql
       |SELECT et_a, et_b, CAST(count(*) AS BIGINT) AS n
       |FROM p GROUP BY 1, 2
       |ORDER BY n DESC, et_a, et_b LIMIT 20""".stripMargin) { (s, dir) =>
    transitions(s, dir)
      .groupBy("et_a", "et_b").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("et_a"), col("et_b"))
      .limit(20)
  }

  /** First-order Markov next-action table: for every event type, its most
    * likely within-session successor (ties pinned on successor name
    * ascending — the argmax min-struct convention) and the transition
    * probability in integer ppm (`n_ab·10⁶ // n_a` — q57's rule).
    *
    * Scale: the transition counts collapse to |event types|² rows before
    * anything orders or joins; the argmax is a partial+final
    * `min(struct(-n, et_b))` — no window, no extra shuffle beyond the
    * tiny count aggregation.
    */
  val q135 = Q("q135_markov_next",
    s"""WITH $pathSql,
       |c AS (SELECT et_a, et_b, CAST(count(*) AS BIGINT) AS n
       |      FROM p GROUP BY 1, 2),
       |t AS (SELECT et_a, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
       |best AS (
       |  SELECT et_a, et_b AS next_type, n FROM (
       |    SELECT et_a, et_b, n,
       |           row_number() OVER (PARTITION BY et_a ORDER BY n DESC, et_b ASC) AS rk
       |    FROM c) WHERE rk = 1)
       |SELECT b.et_a AS event_type, b.next_type,
       |       CAST(b.n * 1000000 // t.tot AS BIGINT) AS prob_ppm
       |FROM best b JOIN t ON t.et_a = b.et_a
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val c = transitions(s, dir)
      .groupBy("et_a", "et_b").agg(count(lit(1)).as("n"))
      .persist() // argmax + totals fold it
    val t = c.groupBy("et_a").agg(sum("n").as("tot"))
    val best = c
      .groupBy("et_a")
      .agg(min(struct((-col("n")).as("neg"), col("et_b"))).as("b"))
      .select(col("et_a"), col("b.et_b").as("next_type"), (-col("b.neg")).as("n"))
    best.join(t, "et_a")
      .select(col("et_a").as("event_type"), col("next_type"),
        expr("n * 1000000 div tot").as("prob_ppm"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q134, q135)
}
