package graft.operators

import graft.{Q, Tables}
import graft.plans.Asof
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 65 (round 11, fourteenth wave): the join-size predictor and the
  * prior-state feature join — one shuffle-planning diagnostic, one
  * oracle-checked declared face for the custom as-of operator.
  *
  *  - q213: JOIN SIZE REPORT — predict a join's output cardinality
  *    EXACTLY, without running it: |A ⋈ B| on key k is Σ_k cntA(k)·
  *    cntB(k) — two keyed counts + one key-cardinality join, orders of
  *    magnitude cheaper than the join it sizes. Reported here for the
  *    l_partkey SELF-join ("would the co-occurrence build explode?" —
  *    the question [[Skew.report]] answers per-frame, answered per-JOIN):
  *    one row of n_keys, row count, predicted rows, the max single-key
  *    contribution and its ppm share. Products and the sum ride
  *    DECIMAL(38,0) in-plan (the q169 convention — per-key products hit
  *    ~10¹⁸ long before any real fact table stops fitting; HUGEINT on
  *    the oracle side); the one-row report closes its ppm share in
  *    BigInt driver-side (q198 convention — Spark's decimal division
  *    ROUNDS where DuckDB `//` truncates). The predictor's exactness is
  *    LAW-pinned: predicted ≡ the actual self-join count on the spec
  *    fixture.
  *  - q214: PRIOR-STATE ENRICH — the t−1 feature join: every purchase
  *    event enriched with the user's value-state as of JUST BEFORE the
  *    event (null on a user's first event), i.e. each fact row joined
  *    to the most recent strictly-earlier version row. Runs through the
  *    NATIVE as-of operator ([[graft.plans.Asof.join]] — LogicalPlan +
  *    Strategy + SparkPlan via SparkSessionExtensions), giving the
  *    custom-plan leg its declared, ORACLE-CHECKED face (q42 pins the
  *    window-composed as-of; AsofPlanSpec pins this plan's zero-Exchange
  *    bucketed path; this pins the custom plan's SEMANTICS against
  *    DuckDB's lag() — as-of ≡ lag on the version stream, cross-engine).
  *
  * Scale: q213 is two partial+final keyed counts and a key-cardinality
  * join — the report costs one shuffle of DISTINCT keys, not of rows
  * (run it before any candidate self-join; its top1 share is the
  * salting trigger). q214's as-of exec merges per-key sorted runs after
  * one shuffle each side — and with both sides bucketed by user the
  * plan is the AsofPlanSpec zero-Exchange shape.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star planning /
  * temporal ops.
  */
object TierSixtyFive {

  val q213 = Q("q213_join_size_report",
    """WITH ck AS (
      |  SELECT l_partkey, CAST(count(*) AS HUGEINT) AS c
      |  FROM lineitem GROUP BY 1),
      |pr AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |         CAST(sum(c) AS BIGINT) AS n_rows,
      |         sum(c * c) AS predicted, max(c * c) AS maxk
      |  FROM ck)
      |SELECT n_keys, n_rows,
      |       CAST(predicted AS BIGINT) AS predicted_rows,
      |       CAST(maxk AS BIGINT) AS max_key_rows,
      |       CAST(1000000 * maxk // predicted AS BIGINT) AS top1_share_ppm
      |FROM pr""".stripMargin) { (s, dir) =>
    joinSizeReport(s, Tables.load(s, dir, "lineitem"), "l_partkey")
  }

  /** The q213 body over ANY frame and key — the library/SQL-twin face
    * (`graft_join_size`): size the self-join on `key` without running
    * it. */
  private[graft] def joinSizeReport(s: SparkSession, df: DataFrame,
      key: String): DataFrame = {
    import s.implicits._
    val ck = df.groupBy(key).agg(count(lit(1)).as("c"))
    val r = ck.agg(
        count(lit(1)).as("n_keys"),
        sum("c").cast("long").as("n_rows"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("predicted"),
        max((col("c") * col("c")).cast("decimal(38,0)")).as("maxk"))
      .collect()(0) // bounded 1-row report; ppm closed in BigInt (q198
    // convention — Spark's decimal division ROUNDS where `//` truncates)
    val predicted = BigInt(r.getDecimal(2).toBigInteger)
    val maxk = BigInt(r.getDecimal(3).toBigInteger)
    Seq((r.getLong(0), r.getLong(1), predicted.toLong, maxk.toLong,
        (BigInt(1000000) * maxk / predicted).toLong))
      .toDF("n_keys", "n_rows", "predicted_rows", "max_key_rows",
        "top1_share_ppm")
  }

  /** The enriched fact frame — exposed so the spec can pin the custom
    * plan's presence and the first-event null branch. */
  private[graft] def priorStateOf(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    val versions = ev.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("v_event_id"), col("cents").as("prev_cents"))
    Asof.join(ev.filter(col("event_type") === "purchase"), versions,
        leftKeys = Seq("user_id"), rightKeys = Seq("v_user"),
        leftOrd = Seq("ts", "event_id"), rightOrd = Seq("v_ts", "v_event_id"))
      .select("user_id", "event_id", "cents", "prev_cents")
  }

  val q214 = Q("q214_prior_state_enrich",
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |lagd AS (
      |  SELECT *, lag(cents) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
      |  FROM ev)
      |SELECT user_id, event_id, cents, prev_cents
      |FROM lagd WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    priorStateOf(s, dir).orderBy("user_id", "event_id")
  }

  val all: Seq[Q] = Seq(q213, q214)
}
