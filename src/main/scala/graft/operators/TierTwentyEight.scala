package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 28 (round 8, final wave): the two product-analytics closers on
  * the events family — how LONG conversion takes, and what TOUCH gets
  * the credit.
  *
  *  - q140: CONVERSION LATENCY — signup→first-purchase delay
  *    distribution (count + exact p50/p90): the time-to-convert metric
  *    between q81's funnel counts and q88's retention grid.
  *  - q141: LAST-TOUCH ATTRIBUTION — every purchase credited to the
  *    user's most recent click/view inside a 24 h lookback (or 'none'):
  *    the classic marketing-attribution join (q37's interval shape +
  *    the pinned arg-max).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star breadth ops.
  */
object TierTwentyEight {

  /** Signup→first-purchase delays: per user the FIRST signup, then the
    * first purchase at-or-after it; delay in whole seconds (micros diff
    * floored — integer both engines). Exact percentiles over the delays
    * (q40's percentile ≡ quantile_cont convention, round(,6) at the
    * boundary); the final one-row fold is the q46/q51 scalar shape.
    *
    * Scale: two keyed min-aggregations + one user-keyed join — all
    * partial+final; nothing global until the ≤1-row percentile fold
    * (the documented scalar-agg SinglePartition, over |converted users|
    * delays — production swaps in `Sketches.approxQuantile` when even
    * that column is too wide).
    */
  /** The per-converted-user delay column (whole seconds) q140 folds —
    * exposed so the documented scale path ([[graft.functions.Sketches
    * .approxQuantiles]] when even the delay column is too wide for the
    * exact SinglePartition percentile) is spec-pinned against the exact
    * fold (TierTwentyEightSpec's rank-error gate). */
  private[graft] def delays(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu_user"), col("ts"))
      .join(su, col("pu_user") === su("user_id"))
      .filter(col("ts") >= col("s_ts"))
      .groupBy("pu_user").agg(min("ts").as("p_ts"))
    su.join(pu, su("user_id") === col("pu_user"))
      .select(expr("(unix_micros(CAST(p_ts AS TIMESTAMP)) - unix_micros(CAST(s_ts AS TIMESTAMP))) div 1000000")
        .as("delay_s"))
  }

  val q140 = Q("q140_conversion_latency",
    """WITH su AS (
      |  SELECT user_id, min(ts) AS s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |pu AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN su ON su.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts GROUP BY 1),
      |d AS (
      |  SELECT date_diff('microsecond', su.s_ts, pu.p_ts) // 1000000 AS delay_s
      |  FROM su JOIN pu ON pu.user_id = su.user_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_converted,
      |       round(quantile_cont(CAST(delay_s AS DOUBLE), 0.5), 6) AS p50_s,
      |       round(quantile_cont(CAST(delay_s AS DOUBLE), 0.9), 6) AS p90_s
      |FROM d""".stripMargin) { (s, dir) =>
    delays(s, dir)
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(CAST(delay_s AS DOUBLE), 0.5)"), 6).as("p50_s"),
        round(expr("percentile(CAST(delay_s AS DOUBLE), 0.9)"), 6).as("p90_s"))
  }

  /** Last-touch attribution: each purchase credited to the same user's
    * LATEST click/view strictly before it and inside a 24 h lookback;
    * purchases with no such touch report 'none'. The arg-max is the
    * pinned `max(struct(ts, event_id, type))` — latest touch, ties on
    * larger event id (partial+final, no window over the joined stream).
    *
    * Scale: the interval join is q37's shape — equi-join on user_id
    * carries the shuffle, the 24 h range filters inside; per-purchase
    * candidates collapse map-side through the struct max BEFORE the
    * purchase-id shuffle; the per-channel rollup is a ≤4-row fold.
    */
  val q141 = Q("q141_attribution",
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id AS pid, e.event_type AS ch, e.ts AS ets, e.event_id AS eid
      |  FROM p JOIN events e ON e.user_id = p.user_id
      |   AND e.event_type IN ('click', 'view')
      |   AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 24 HOUR),
      |b AS (
      |  SELECT pid, ch FROM (
      |    SELECT pid, ch,
      |           row_number() OVER (PARTITION BY pid ORDER BY ets DESC, eid DESC) AS rk
      |    FROM j) WHERE rk = 1)
      |SELECT coalesce(b.ch, 'none') AS channel, CAST(count(*) AS BIGINT) AS n_purchases
      |FROM p LEFT JOIN b ON b.pid = p.event_id
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val touch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("ets"), col("event_id").as("eid"),
        col("event_type").as("ch"))
    val best = p.join(touch,
        col("user_id") === col("pu") &&
          col("ets") < col("pts") &&
          col("ets") >= col("pts") - expr("INTERVAL 24 HOURS"))
      .groupBy("pid")
      .agg(max(struct(col("ets"), col("eid"), col("ch"))).as("b"))
      .select(col("pid"), col("b.ch").as("ch"))
    p.join(best, Seq("pid"), "left")
      .groupBy(coalesce(col("ch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy("channel")
  }

  val all: Seq[Q] = Seq(q140, q141)
}
