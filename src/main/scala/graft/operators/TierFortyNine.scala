package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 49 (round 10, twenty-first wave): directional rules and the
  * forecastability baseline.
  *
  *  - q182: ASSOCIATION RULES — directional `a → b` co-purchase rules
  *    ranked by CONFIDENCE (|buyers of both|·10⁶ div |buyers of a|,
  *    all-integer) with a minimum-support floor: the Agrawal-style
  *    rule mining q146's symmetric counts don't give (confidence is
  *    asymmetric — "milk→bread" can hold while "bread→milk" doesn't).
  *    Top-20 in the pinned (confidence DESC, support DESC, a, b) order.
  *  - q183: FORECASTABILITY — the naive seasonal baseline (forecast =
  *    same weekday last week) scored per event type: mean absolute
  *    error ppm of mean volume (integer: MAE·10⁶ div mean, both exact
  *    div) — the floor any real model must beat, and a ranking of
  *    which streams are rhythm-dominated vs noisy.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFortyNine {

  private val TopK = 20
  private val MinSupport = 10L // buyers of both, the support floor

  val q182 = Q("q182_association_rules",
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM cs GROUP BY 1),
       |pair AS (
       |  SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS both
       |  FROM cs a JOIN cs b ON b.c = a.c AND a.s <> b.s
       |  GROUP BY 1, 2)
       |SELECT p.sa AS ante, p.sb AS cons, p.both AS support,
       |       (p.both * 1000000) // d.n AS conf_ppm
       |FROM pair p JOIN deg d ON d.s = p.sa
       |WHERE p.both >= $MinSupport
       |ORDER BY conf_ppm DESC, support DESC, ante, cons LIMIT $TopK""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val cs = pins(Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("su")).distinct())
      // pinned: feeds the degree count and both pair sides
    val deg = cs.groupBy(col("su").as("ds")).agg(count(lit(1)).as("n"))
    // whale-customer guard: salt the c-keyed self-join (q154's guard;
    // pair set identical by construction). `both` is symmetric, so only
    // ia < ib pairs feed the aggregation (half the Σd² rows); the support
    // floor applies to the HALF (same count both directions) and the
    // surviving pair-count-sized frame is mirrored to recover (ante, cons)
    // in both directions.
    val pairHalf = pins(Skew.saltedCoPairsHalf(cs, col("c"), col("su"))
      .groupBy(col("ia").as("ante"), col("ib").as("cons"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinSupport))
      // pinned: feeds both mirror legs
    val out = pairHalf
      .unionByName(pairHalf.select(col("cons").as("ante"),
        col("ante").as("cons"), col("support")))
      .join(broadcast(deg), col("ds") === col("ante"))
      .select(col("ante"), col("cons"), col("support"),
        expr("(support * 1000000) div n").as("conf_ppm"))
      .orderBy(col("conf_ppm").desc, col("support").desc, col("ante"), col("cons"))
      .limit(TopK)
    Release.onFirstExecution(out, () => pins.release())
  }

  val q183 = Q("q183_forecastability",
    """WITH dc AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT a.event_type, a.cnt AS actual, f.cnt AS forecast
      |  FROM dc a JOIN dc f ON f.event_type = a.event_type AND f.d = a.d - 7)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err_sum,
      |       CAST((sum(abs(actual - forecast)) * 1000000) // sum(actual) AS BIGINT)
      |         AS mae_ppm_of_mean
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val dc = pins(Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .agg(count(lit(1)).as("cnt")))
      // pinned: both join sides
    val f = dc.select(col("event_type").as("fe"), (col("d") + 7).as("fd"),
      col("cnt").as("forecast"))
    val out = dc.join(f, col("fe") === col("event_type") && col("fd") === col("d"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cnt") - col("forecast"))).as("abs_err_sum"),
        expr("(sum(abs(cnt - forecast)) * 1000000) div sum(cnt)").as("mae_ppm_of_mean"))
      .orderBy("event_type")
    Release.onFirstExecution(out, () => pins.release())
  }

  val all: Seq[Q] = Seq(q182, q183)
}
