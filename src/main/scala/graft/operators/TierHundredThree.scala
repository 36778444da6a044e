package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 103 (round 15): sampling-design readouts — optimal stratified
  * allocation and the effective size of a weighted sample.
  *
  *  - q285: NEYMAN ALLOCATION (Neyman 1934) — split a 1000-unit sample
  *    budget across customer market segments proportional to
  *    `N_h · S_h` (stratum size × stratum standard deviation of
  *    account balance): the minimum-variance design for a fixed
  *    budget, and THE reason to stratify at all (uniform and
  *    proportional allocation are its degenerate cases). Moments are
  *    exact Int64 cents; `S_h` is one shared double tree (the q272
  *    IEEE rule); the integerized weights then go through q258's
  *    Hamilton largest-remainder machinery ([[TierEightyNine.allocate]])
  *    so the allocations are integers that sum to EXACTLY the budget.
  *  - q286: EFFECTIVE SAMPLE SIZE / DESIGN EFFECT (Kish 1965) — for
  *    each event type, the per-user weights (purchase-value mass)
  *    yield `ESS = (Σw)²/Σw²` and `deff = n·Σw²/(Σw)²`: how many
  *    equal-weight samples the weighted sample is worth, and the
  *    variance inflation the weighting costs. The planning readout
  *    behind every importance-sampled corpus mix (q91's temperature
  *    mix chooses weights; this prices them). Exact Int64 sums, one
  *    shared double tree, milli-scaled floors.
  *
  * Scale: both are single partial+final aggregations over the keyed
  * frame, folded to |segments| / |event types| rows; the Hamilton pass
  * is a broadcast pair-rank on the group aggregate (q258's argument).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation / curation ops.
  */
object TierHundredThree {

  private[graft] val Budget = 1000L

  /** Neyman weights over ANY `(source, cents)` frame: one row per
    * stratum `(source, n_h, w)` with `w = ⌊n_h · s_h⌋` (floored shared
    * double tree; single-member or constant strata weigh 0). */
  private[graft] def neymanWeights(sc: DataFrame): DataFrame =
    sc.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents") * col("cents")).as("q"))
      .select(col("source"), col("n").as("n_h"),
        expr(
          """CAST(CASE WHEN n < 2 THEN 0
            |     WHEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) <= 0 THEN 0
            |     ELSE floor(CAST(n AS DOUBLE)
            |       * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            |              / (CAST(n AS DOUBLE) - 1.0)))
            |END AS BIGINT)""".stripMargin).as("w"))

  val q285 = Q("q285_neyman_allocation",
    s"""WITH sc AS (
       |  SELECT c_mktsegment AS source,
       |         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
       |  FROM customer),
       |m AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cents) AS BIGINT) AS s,
       |         CAST(sum(cents * cents) AS BIGINT) AS q
       |  FROM sc GROUP BY 1),
       |w AS (
       |  SELECT source, n AS n_h,
       |         CAST(CASE WHEN n < 2 THEN 0
       |              WHEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) <= 0 THEN 0
       |              ELSE floor(CAST(n AS DOUBLE)
       |                * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |                       / (CAST(n AS DOUBLE) - 1.0)))
       |         END AS BIGINT) AS w
       |  FROM m),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
       |q2 AS (
       |  SELECT source, n_h, w, ($Budget * w) // tw AS base,
       |         ($Budget * w) % tw AS rem
       |  FROM w CROSS JOIN tot),
       |l AS (SELECT CAST($Budget - sum(base) AS BIGINT) AS l FROM q2),
       |r AS (
       |  SELECT a.source, CAST(1 + count(b.source) AS BIGINT) AS rk
       |  FROM q2 a LEFT JOIN q2 b
       |    ON (b.rem > a.rem) OR (b.rem = a.rem AND b.source < a.source)
       |  GROUP BY 1)
       |SELECT q2.source, q2.n_h, q2.w AS w_neyman,
       |       CAST(q2.base + CASE WHEN r.rk <= l.l THEN 1 ELSE 0 END AS BIGINT)
       |         AS alloc
       |FROM q2 JOIN r ON r.source = q2.source CROSS JOIN l
       |ORDER BY q2.source""".stripMargin) { (s, dir) =>
    val weights = neymanWeights(Tables.load(s, dir, "customer")
      .select(col("c_mktsegment").as("source"),
        floor(col("c_acctbal") * 100).cast("long").as("cents")))
    weights.join(
        TierEightyNine.allocate(weights.select("source", "w"), Budget)
          .select(col("source"), col("seats").as("alloc")),
        "source")
      .select(col("source"), col("n_h"), col("w").as("w_neyman"), col("alloc"))
      .orderBy("source")
  }

  /** ESS/deff over ANY `(k, w)` weighted frame: per key
    * `(k, n, sum_w, sum_w2, ess_milli, deff_milli)` — exact sums, one
    * shared double tree, zero-mass keys declared −1. */
  private[graft] def essOver(kw: DataFrame): DataFrame =
    kw.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sum_w"),
        sum(col("w") * col("w")).as("sum_w2"))
      .select(col("k"), col("n"), col("sum_w"), col("sum_w2"),
        expr(
          """CAST(CASE WHEN sum_w2 <= 0 THEN -1
            |     ELSE floor(1000.0 * (CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE))
            |                / CAST(sum_w2 AS DOUBLE))
            |END AS BIGINT)""".stripMargin).as("ess_milli"),
        expr(
          """CAST(CASE WHEN sum_w <= 0 THEN -1
            |     ELSE floor(1000.0 * CAST(n AS DOUBLE) * CAST(sum_w2 AS DOUBLE)
            |                / (CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)))
            |END AS BIGINT)""".stripMargin).as("deff_milli"))
      .orderBy("k")

  val q286 = Q("q286_effective_sample_size",
    """WITH uw AS (
      |  SELECT event_type AS k, user_id,
      |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS w
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(w) AS BIGINT) AS sum_w,
      |         CAST(sum(w * w) AS BIGINT) AS sum_w2
      |  FROM uw GROUP BY 1)
      |SELECT k, n, sum_w, sum_w2,
      |       CAST(CASE WHEN sum_w2 <= 0 THEN -1
      |            ELSE floor(1000.0 * (CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE))
      |                       / CAST(sum_w2 AS DOUBLE))
      |       END AS BIGINT) AS ess_milli,
      |       CAST(CASE WHEN sum_w <= 0 THEN -1
      |            ELSE floor(1000.0 * CAST(n AS DOUBLE) * CAST(sum_w2 AS DOUBLE)
      |                       / (CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)))
      |       END AS BIGINT) AS deff_milli
      |FROM m ORDER BY k""".stripMargin) { (s, dir) =>
    essOver(Tables.load(s, dir, "events")
      .groupBy(col("event_type").as("k"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("w")))
  }

  val all: Seq[Q] = Seq(q285, q286)
}
