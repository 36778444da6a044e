package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 90 (round 13): the rank-correlation companion and the
  * running-mean drift detector.
  *
  *  - q259: SPEARMAN ρ (Spearman 1904) over the SAME nation aggregate
  *    q252 reads — the companion statistic analysts report beside
  *    Kendall τ (τ weighs pair inversions; ρ weighs rank displacement
  *    squared). Tie-correct by construction: computed as PEARSON OVER
  *    AVERAGE RANKS, with ranks kept as the exact integer
  *    `rank2 = 2·|{<}| + |{=}| + 1` (twice the average rank — never a
  *    fractional .5). The Spark side derives rank2 from value-grouped
  *    counts + ONE two-pass distributed prefix sum per leg (the q202
  *    count-of-counts rank: for a value with inclusive cumulative count
  *    `cum` and multiplicity `cnt`, rank2 = 2·cum − cnt + 1 — no O(G²)
  *    pair expansion, no single-partition sort; TierNinetySpec pins it
  *    ≡ the definitional pair count on the fixture). The oracle keeps
  *    the definitional CROSS JOIN (G is the nation cardinality there).
  *    The three centered moments are exact Int64: with doubled ranks
  *    ≤ 2·G the worst term `n·Σab` is bounded by 4·G⁴ — safe to
  *    G ≈ 3.9·10⁴ groups (the grouping dimension, not the data); past
  *    that, run the same shape over DECIMAL(38,0) sums (the
  *    `graft_spearman` SQL twin takes any table — cast its rank legs)
  *    or fold the moments in BigInt driver-side. Only the final ratio
  *    is float: one int→double cast each leg, one multiply, one
  *    `sqrt`, one divide.
  *  - q260: PAGE–HINKLEY DRIFT CHART (Page 1954, the running-mean
  *    form) — per event type over the daily grid: `M_t = Σ_{i≤t}(x_i −
  *    x̄_i − δ)` with x̄_i the RUNNING integer mean `⌊S_i/i⌋`,
  *    `PH_t = M_t − min_{j≤t} M_j`, alarm when PH exceeds λ. Where
  *    q201's CUSUM screens against a FROZEN phase-I mean, PH
  *    self-calibrates — the detector you deploy before you have a
  *    trusted baseline. δ = μ/50 slack and λ = μ/4 use the same
  *    frozen-μ convention as q201's k and h (both alarm states probed
  *    live on the fixture). Genuinely sequential ⇒ the q201 shape: one
  *    partition per type over the calendar-bounded grid, FOUR longs of
  *    carried state, `WITH RECURSIVE` on the oracle side.
  *
  * Scale: q259 touches only the nation aggregate; q260 shuffles the
  * daily grid once and folds within type.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation / monitoring ops.
  */
object TierNinety {

  /** PH slack divisor: δ = μ / 50 (2 % of level — drifts smaller than
    * this are absorbed). */
  private[graft] val DeltaDiv = 50L
  /** PH alarm divisor: λ = μ / 4 (probed: both states live). */
  private[graft] val LambdaDiv = 4L

  /** Doubled average ranks of one leg as `(v, r2)` per DISTINCT value —
    * value-grouped counts + the two-pass distributed prefix sum: a value
    * with inclusive cumulative count `cum` and multiplicity `cnt` spans
    * positions (cum−cnt+1)…cum, so its doubled average rank is
    * `2·cum − cnt + 1`. O(G log G) work, fully distributed — the
    * replacement for the definitional O(G²) pair count (TierNinetySpec
    * pins both equal on the q259 fixture). */
  private def rank2Of(vals: DataFrame, c: String): DataFrame = {
    val cc = vals.groupBy(c).agg(count(lit(1)).as("cnt"))
    Cumulative.runningSum(vals.sparkSession, cc, Seq(col(c)), col("cnt"), "cum")
      .select(col(c), (lit(2L) * col("cum") - col("cnt") + 1L).as(s"r2_$c"))
  }

  /** Spearman ρ over ANY `(gk, x, y)` group aggregate — the extracted
    * library face (`graft_spearman` SQL twin). One output row:
    * `(n_groups, sxy, sxx, syy, rho_r6)`; a constant leg (sxx or syy
    * zero) is DECLARED ρ = 0. Int64 moment bound: 4·G⁴ — see the tier
    * doc for the G ≈ 3.9·10⁴ ceiling and the DECIMAL/BigInt escape. */
  private[graft] def spearmanOver(g: DataFrame): DataFrame = {
    val r = g
      .join(rank2Of(g.select("x"), "x"), "x")
      .join(rank2Of(g.select("y"), "y"), "y")
      .select(col("r2_x").as("ra"), col("r2_y").as("rb"))
    val m = r.agg(count(lit(1)).as("n"), sum("ra").as("sa"), sum("rb").as("sb"),
      sum(col("ra") * col("ra")).as("saa"), sum(col("rb") * col("rb")).as("sbb"),
      sum(col("ra") * col("rb")).as("sab"))
    val (sxy, sxx, syy) = (col("n") * col("sab") - col("sa") * col("sb"),
      col("n") * col("saa") - col("sa") * col("sa"),
      col("n") * col("sbb") - col("sb") * col("sb"))
    m.select(col("n").as("n_groups"), sxy.as("sxy"), sxx.as("sxx"), syy.as("syy"))
      .select(col("n_groups"), col("sxy"), col("sxx"), col("syy"),
        when(col("sxx") === 0 || col("syy") === 0, lit(0.0))
          .otherwise(round(col("sxy").cast("double") /
            sqrt(col("sxx").cast("double") * col("syy").cast("double")), 6))
          .as("rho_r6"))
  }

  val q259 = Q("q259_spearman",
    """WITH g AS (
      |  SELECT c_nationkey AS gk,
      |         CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS x,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM customer GROUP BY 1),
      |r AS (
      |  SELECT a.gk,
      |         CAST(2 * sum(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
      |            + sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS BIGINT) AS ra,
      |         CAST(2 * sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
      |            + sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1 AS BIGINT) AS rb
      |  FROM g a CROSS JOIN g b GROUP BY a.gk),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
      |         CAST(sum(ra * ra) AS BIGINT) AS saa,
      |         CAST(sum(rb * rb) AS BIGINT) AS sbb,
      |         CAST(sum(ra * rb) AS BIGINT) AS sab
      |  FROM r)
      |SELECT n AS n_groups,
      |       CAST(n * sab - sa * sb AS BIGINT) AS sxy,
      |       CAST(n * saa - sa * sa AS BIGINT) AS sxx,
      |       CAST(n * sbb - sb * sb AS BIGINT) AS syy,
      |       CASE WHEN n * saa - sa * sa = 0 OR n * sbb - sb * sb = 0 THEN 0.0
      |            ELSE round((n * sab - sa * sb) / sqrt(
      |              CAST(n * saa - sa * sa AS DOUBLE) *
      |              CAST(n * sbb - sb * sb AS DOUBLE)), 6)
      |       END AS rho_r6
      |FROM m""".stripMargin) { (s, dir) =>
    spearmanOver(Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey").as("gk"))
      .agg(sum(floor(col("c_acctbal") * 100)).as("x"), count(lit(1)).as("y")))
  }

  /** THE Page–Hinkley step — one definition for batch q260 and any live
    * twin. State `(i, S, M, minM)` + observation → next state. Running
    * mean is `S/i` — floor on the non-negative count domain (signed `/`
    * ≡ floor there; keep the domain non-negative if reused). */
  private[graft] def phStep(i: Long, s: Long, m: Long, mn: Long,
      x: Long, delta: Long): (Long, Long, Long, Long) = {
    val i2 = i + 1
    val s2 = s + x
    val m2 = m + x - s2 / i2 - delta
    (i2, s2, m2, if (i == 0) m2 else math.min(mn, m2))
  }

  val q260 = Q("q260_page_hinkley",
    s"""WITH RECURSIVE dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY epoch_us(ts) // 86400000000) AS rn
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, CAST(sum(cnt) // count(*) AS BIGINT) AS mu
       |  FROM dc GROUP BY 1),
       |rec AS (
       |  SELECT dc.event_type, rn, day_idx, cnt,
       |         cnt AS s,
       |         -(st.mu // $DeltaDiv) AS m,
       |         -(st.mu // $DeltaDiv) AS mn
       |  FROM dc JOIN st USING (event_type) WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn, d2.day_idx, d2.cnt,
       |         r.s + d2.cnt,
       |         r.m + d2.cnt - (r.s + d2.cnt) // d2.rn - s2.mu // $DeltaDiv,
       |         least(r.mn, r.m + d2.cnt - (r.s + d2.cnt) // d2.rn
       |           - s2.mu // $DeltaDiv)
       |  FROM rec r JOIN dc d2
       |    ON d2.event_type = r.event_type AND d2.rn = r.rn + 1
       |  JOIN st s2 ON s2.event_type = d2.event_type)
       |SELECT rec.event_type, day_idx, cnt,
       |       CAST(s // rn AS BIGINT) AS mean_run,
       |       CAST(m - mn AS BIGINT) AS ph,
       |       CAST(CASE WHEN m - mn > st.mu // $LambdaDiv
       |            THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM rec JOIN st ON st.event_type = rec.event_type
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    phChart(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
      .orderBy("event_type", "day_idx")
  }

  /** The sequential PH fold over a `(event_type, day_idx, cnt)` grid —
    * one partition per type, sorted days, four longs of carried state;
    * frozen μ only parameterizes δ and λ (the level itself is the
    * running mean — PH's whole point). */
  private[graft] def phChart(dc: DataFrame): DataFrame = {
    val s = dc.sparkSession
    import s.implicits._
    val mu = dc.groupBy(col("event_type").as("et"))
      .agg(expr("CAST(sum(cnt) div count(*) AS BIGINT)").as("mu"))
    dc.join(broadcast(mu), col("event_type") === col("et"))
      .select(col("event_type").cast("string"), col("day_idx").cast("long"),
        col("cnt").cast("long"), col("mu").cast("long"))
      .as[(String, Long, Long, Long)]
      .repartition(col("event_type"))
      .sortWithinPartitions("event_type", "day_idx")
      .mapPartitions { it =>
        var curType: String = null
        var i = 0L; var sAcc = 0L; var m = 0L; var mn = 0L
        it.map { case (t, d, c, mu0) =>
          if (t != curType) { i = 0L; sAcc = 0L; m = 0L; mn = 0L; curType = t }
          val (i2, s2, m2, mn2) = phStep(i, sAcc, m, mn, c, mu0 / DeltaDiv)
          i = i2; sAcc = s2; m = m2; mn = mn2
          val ph = m2 - mn2
          (t, d, c, s2 / i2, ph, if (ph > mu0 / LambdaDiv) 1L else 0L)
        }
      }
      .toDF("event_type", "day_idx", "cnt", "mean_run", "ph", "alarm")
  }

  val all: Seq[Q] = Seq(q259, q260)
}
