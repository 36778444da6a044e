package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 86 (round 13): non-parametric trend and rank-association tests —
  * the distribution-free siblings of the q210 least-squares fit and the
  * q245 autocorrelation.
  *
  *  - q251: MANN–KENDALL TREND TEST (Mann 1945, Kendall 1975) — per
  *    event type over the q149 daily grid: `S = Σ_{i<j} sign(x_j −
  *    x_i)`, the tie-corrected variance `18·Var(S) = n(n−1)(2n+5) −
  *    Σ_t t(t−1)(2t+5)` kept as the EXACT INTEGER `var18`, and the
  *    continuity-corrected normal score `z = (S ∓ 1)/√(Var)`. S, n and
  *    var18 are pure Int64; z's float ops are one int→double cast, one
  *    division by the literal 18.0, one `sqrt` and one division — all
  *    IEEE-identical across engines (FIXTURES.md §3), rounded to 6 dp.
  *    Monotone-robust where q210's slope is level-sensitive: a trend
  *    that doubles or a trend that creeps 1 %/day both move S.
  *  - q252: KENDALL τ-b RANK ASSOCIATION (Kendall 1938; tie form
  *    Kendall 1945) — across nations, does total customer balance move
  *    WITH customer count? Per-nation `x = Σ floor(100·acctbal)` (cents
  *    — floor on identical doubles, never a float sum), `y = count`.
  *    Concordant/discordant via SIGN COMPARISONS, never the
  *    `(x₁−x₂)(y₁−y₂)` product (which wraps Int64 once group sums pass
  *    ~3·10⁹ cents). τ_b = (C−D)/√((n₀−t_x)(n₀−t_y)) with the tie terms
  *    from value-group counts, not pairwise scans.
  *
  * Scale: q251's pair stage is an equi-join on event_type with a range
  * predicate over the calendar-bounded day grid — O(days²) per type is
  * metadata-scale for any horizon (a decade is 3 650 days → 6.7·10⁶
  * sign pairs per type, one task). q252's pair stage is a broadcast
  * nested loop over the GROUP aggregate (nation cardinality — the
  * grouping dimension, not the data); tie counts come from two keyed
  * group-bys on that same aggregate. Nothing touches raw-row pairs.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star monitoring /
  * experiment-analysis ops.
  */
object TierEightySix {

  /** Mann–Kendall over ANY `(event_type, day_idx, cnt)` grid — the
    * extracted library face (`graft_mann_kendall` SQL twin). Output one
    * row per type: `(event_type, n_days, s_stat, var18, z_r6)`.
    * var18 = 18·Var(S) exactly; z uses the standard ∓1 continuity
    * correction and is 0 when S = 0 or when every day ties (var18 = 0 ⇒
    * all values equal ⇒ S = 0, so the guard is belt-and-braces). */
  private[graft] def mannKendallOver(dc: DataFrame): DataFrame = {
    val a = dc.select(col("event_type"), col("day_idx").as("da"), col("cnt").as("xa"))
    val b = dc.select(col("event_type").as("et_b"), col("day_idx").as("db"),
      col("cnt").as("xb"))
    val sTab = a.join(b, col("event_type") === col("et_b") && col("da") < col("db"))
      .groupBy("event_type")
      .agg(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s_raw"))
    val nTab = dc.groupBy(col("event_type").as("et_n"))
      .agg(count(lit(1)).as("n_days"))
    val tieTab = dc.groupBy(col("event_type").as("et_t"), col("cnt"))
      .agg(count(lit(1)).as("t"))
      .groupBy("et_t")
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie"))
    val var18 = col("n_days") * (col("n_days") - 1) *
      (lit(2L) * col("n_days") + 5) - col("tie")
    val sd = sqrt(col("var18").cast("double") / lit(18.0))
    nTab
      .join(tieTab, col("et_n") === col("et_t"))
      .join(sTab, col("et_n") === col("event_type"), "left")
      .select(col("et_n").as("event_type"), col("n_days"),
        coalesce(col("s_raw"), lit(0L)).as("s_stat"), var18.as("var18"))
      .select(col("event_type"), col("n_days"), col("s_stat"), col("var18"),
        when(col("var18") === 0, lit(0.0))
          .when(col("s_stat") > 0,
            round((col("s_stat") - 1).cast("double") / sd, 6))
          .when(col("s_stat") < 0,
            round((col("s_stat") + 1).cast("double") / sd, 6))
          .otherwise(lit(0.0)).as("z_r6"))
      .orderBy("event_type")
  }

  val q251 = Q("q251_mann_kendall",
    """WITH dc AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.event_type AS et,
      |         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
      |                       WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM dc a JOIN dc b
      |    ON a.event_type = b.event_type AND a.day_idx < b.day_idx
      |  GROUP BY 1),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM dc GROUP BY 1),
      |t AS (
      |  SELECT event_type, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
      |  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS t
      |        FROM dc GROUP BY event_type, cnt)
      |  GROUP BY 1),
      |v AS (
      |  SELECT n.event_type, n.n AS n_days,
      |         CAST(coalesce(p.s, 0) AS BIGINT) AS s_stat,
      |         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie AS BIGINT) AS var18
      |  FROM n JOIN t ON t.event_type = n.event_type
      |  LEFT JOIN p ON p.et = n.event_type)
      |SELECT event_type, n_days, s_stat, var18,
      |       CASE WHEN var18 = 0 THEN 0.0
      |            WHEN s_stat > 0
      |              THEN round((s_stat - 1) / sqrt(var18 / 18.0), 6)
      |            WHEN s_stat < 0
      |              THEN round((s_stat + 1) / sqrt(var18 / 18.0), 6)
      |            ELSE 0.0 END AS z_r6
      |FROM v ORDER BY event_type""".stripMargin) { (s, dir) =>
    mannKendallOver(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
  }

  /** Kendall τ-b over ANY group aggregate `(gk, x, y)` — the extracted
    * library face (`graft_kendall_tau` SQL twin). One output row:
    * `(n_groups, concordant, discordant, ties_x, ties_y, tau_r6)`.
    * τ = 0 is DECLARED when either tie-corrected denominator leg is
    * empty (a constant margin carries no rank signal). */
  private[graft] def kendallTauOver(g: DataFrame): DataFrame = {
    val a = g.select(col("gk").as("ga"), col("x").as("xa"), col("y").as("ya"))
    val b = g.select(col("gk").as("gb"), col("x").as("xb"), col("y").as("yb"))
    val conc = (col("xa") < col("xb") && col("ya") < col("yb")) ||
      (col("xa") > col("xb") && col("ya") > col("yb"))
    val disc = (col("xa") < col("xb") && col("ya") > col("yb")) ||
      (col("xa") > col("xb") && col("ya") < col("yb"))
    val cd = a.join(broadcast(b), col("ga") < col("gb"))
      .agg(coalesce(sum(when(conc, 1L).otherwise(0L)), lit(0L)).as("c"),
        coalesce(sum(when(disc, 1L).otherwise(0L)), lit(0L)).as("d"))
    val m = g.agg(count(lit(1)).as("m"))
    val tx = g.groupBy("x").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("(t * (t - 1)) div 2")), lit(0L)).as("n1"))
    val ty = g.groupBy("y").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("(t * (t - 1)) div 2")), lit(0L)).as("n2"))
    val n0 = expr("(m * (m - 1)) div 2")
    cd.crossJoin(m).crossJoin(tx).crossJoin(ty)
      .select(col("m").as("n_groups"), col("c").as("concordant"),
        col("d").as("discordant"), col("n1").as("ties_x"), col("n2").as("ties_y"),
        when(n0 - col("n1") === 0 || n0 - col("n2") === 0, lit(0.0))
          .otherwise(round((col("c") - col("d")).cast("double") /
            sqrt((n0 - col("n1")).cast("double") *
              (n0 - col("n2")).cast("double")), 6)).as("tau_r6"))
  }

  val q252 = Q("q252_kendall_tau",
    """WITH g AS (
      |  SELECT c_nationkey AS gk,
      |         CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS x,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM customer GROUP BY 1),
      |p AS (
      |  SELECT
      |    CAST(coalesce(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
      |                             OR (a.x > b.x AND a.y > b.y)
      |                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS c,
      |    CAST(coalesce(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
      |                             OR (a.x > b.x AND a.y < b.y)
      |                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS d
      |  FROM g a JOIN g b ON a.gk < b.gk),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM g),
      |tx AS (SELECT CAST(coalesce(sum((t * (t - 1)) // 2), 0) AS BIGINT) AS n1
      |       FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM g GROUP BY x)),
      |ty AS (SELECT CAST(coalesce(sum((t * (t - 1)) // 2), 0) AS BIGINT) AS n2
      |       FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM g GROUP BY y))
      |SELECT m.m AS n_groups, p.c AS concordant, p.d AS discordant,
      |       tx.n1 AS ties_x, ty.n2 AS ties_y,
      |       CASE WHEN (m.m * (m.m - 1)) // 2 - tx.n1 = 0
      |              OR (m.m * (m.m - 1)) // 2 - ty.n2 = 0 THEN 0.0
      |            ELSE round((p.c - p.d) / sqrt(
      |              CAST((m.m * (m.m - 1)) // 2 - tx.n1 AS DOUBLE) *
      |              CAST((m.m * (m.m - 1)) // 2 - ty.n2 AS DOUBLE)), 6)
      |       END AS tau_r6
      |FROM p, m, tx, ty""".stripMargin) { (s, dir) =>
    kendallTauOver(Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey").as("gk"))
      .agg(sum(floor(col("c_acctbal") * 100)).as("x"),
        count(lit(1)).as("y")))
  }

  val all: Seq[Q] = Seq(q251, q252)
}
