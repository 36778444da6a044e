package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 97 (round 14): the distribution-shift pair — the two classical
  * distances between the experiment arms' revenue distributions, one
  * sup-metric and one integral metric, both EXACT by integer
  * cross-multiplication (no CDF ever becomes a float):
  *
  *  - q273: TWO-SAMPLE KOLMOGOROV–SMIRNOV D (Kolmogorov 1933, Smirnov
  *    1939) — `D = max_x |F_a(x) − F_b(x)|`, cross-multiplied to
  *    `max |cum_a·n_b − cum_b·n_a|` over the merged value spine; the
  *    reported `d_ppm = 10⁶·num // (n_a·n_b)` is exact floor fixed-point.
  *    The sup metric flags ANY shape difference (location, scale,
  *    tails) — the readout q194's rank test (location-only) cannot see.
  *  - q274: 1-D WASSERSTEIN (earth mover's) DISTANCE —
  *    `W₁ = ∫|F_a − F_b| dx`, the integral twin: how many cent-units of
  *    mass must MOVE to turn one arm's distribution into the other's.
  *    Exactly `Σ_v |cum_a(v)·n_b − cum_b(v)·n_a| · (next(v) − v)` over
  *    the value spine, reported as centi-cents
  *    `(100·num) // (n_a·n_b)`. Int64 envelope: |cum·n| ≤ n_a·n_b ≈
  *    4·10⁸ at sf0.1, × the cents range 10⁷ ≈ 4·10¹⁵, ×100 ≈ 4·10¹⁷ —
  *    safe.
  *
  * Machinery: one value-grouped aggregation, TWO chained two-pass
  * distributed prefix sums ([[Cumulative.runningSum]] — never a
  * partitionless window), and for q274 the value gap via
  * [[Cumulative.leadValue]] (the distributed global lead(1), added this
  * round: range-partition + sort + one bounded boundary read). An empty
  * arm is DECLARED −1 (a sentinel, not ∞/NaN) in both readouts.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation / drift ops.
  */
object TierNinetySeven {

  /** The shared shift frame over ANY `(arm, cents)` per-unit frame:
    * `(cents, cnt0, cnt1, rs0, rs1, nxt)` — per-value counts, inclusive
    * cumulative counts per arm, next value (NULL on the last). */
  private[graft] def shiftFrame(um: DataFrame): DataFrame = {
    val s = um.sparkSession
    val g = um.groupBy("cents").agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("cnt0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cnt1"))
    val r0 = Cumulative.runningSum(s, g, Seq(col("cents")), col("cnt0"), "rs0")
    val r1 = Cumulative.runningSum(s, r0, Seq(col("cents")), col("cnt1"), "rs1")
    Cumulative.leadValue(s, r1, Seq(col("cents")), col("cents"), "nxt")
  }

  /** KS over ANY `(arm, cents)` frame — one row
    * `(n_a, n_b, d_num, d_ppm)`. */
  private[graft] def ksOver(um: DataFrame): DataFrame = {
    val s = um.sparkSession
    import s.implicits._
    val sf = shiftFrame(um).persist()
    val t = sf.agg(sum("cnt0"), sum("cnt1")).collect()(0)
    val (n0, n1) = (t.getLong(0), t.getLong(1))
    val num =
      if (n0 == 0 || n1 == 0) -1L
      else sf.agg(max(abs(col("rs0") * n1 - col("rs1") * n0))).collect()(0).getLong(0)
    sf.unpersist(blocking = false)
    Seq((n0, n1, num, if (num < 0) -1L else 1000000L * num / (n0 * n1)))
      .toDF("n_a", "n_b", "d_num", "d_ppm")
  }

  val q273 = Q("q273_ks_two_sample",
    s"""WITH ${TierFiftyFive.armSql},
       |g AS (
       |  SELECT cents,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt0,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1
       |  FROM um GROUP BY 1),
       |rk AS (
       |  SELECT sum(cnt0) OVER (ORDER BY cents) AS rs0,
       |         sum(cnt1) OVER (ORDER BY cents) AS rs1,
       |         sum(cnt0) OVER () AS n0, sum(cnt1) OVER () AS n1
       |  FROM g),
       |m AS (
       |  SELECT any_value(n0) AS n0, any_value(n1) AS n1,
       |         CAST(max(abs(rs0 * n1 - rs1 * n0)) AS BIGINT) AS num
       |  FROM rk)
       |SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
       |       CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN -1 ELSE num END AS BIGINT) AS d_num,
       |       CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN -1
       |            ELSE (1000000 * num) // (n0 * n1) END AS BIGINT) AS d_ppm
       |FROM m""".stripMargin) { (s, dir) =>
    ksOver(TierFiftyFive.armRevenue(s, dir))
  }

  /** 1-D Wasserstein over ANY `(arm, cents)` frame — one row
    * `(n_a, n_b, w1_num, w1_c2)`. */
  private[graft] def wassersteinOver(um: DataFrame): DataFrame = {
    val s = um.sparkSession
    import s.implicits._
    val sf = shiftFrame(um).persist()
    val t = sf.agg(sum("cnt0"), sum("cnt1")).collect()(0)
    val (n0, n1) = (t.getLong(0), t.getLong(1))
    val num =
      if (n0 == 0 || n1 == 0) -1L
      else sf.filter(col("nxt").isNotNull)
        .agg(coalesce(sum(abs(col("rs0") * n1 - col("rs1") * n0)
          * (col("nxt") - col("cents"))), lit(0L)))
        .collect()(0).getLong(0)
    sf.unpersist(blocking = false)
    Seq((n0, n1, num, if (num < 0) -1L else 100L * num / (n0 * n1)))
      .toDF("n_a", "n_b", "w1_num", "w1_c2")
  }

  val q274 = Q("q274_wasserstein_1d",
    s"""WITH ${TierFiftyFive.armSql},
       |g AS (
       |  SELECT cents,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt0,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1
       |  FROM um GROUP BY 1),
       |rk AS (
       |  SELECT cents,
       |         sum(cnt0) OVER (ORDER BY cents) AS rs0,
       |         sum(cnt1) OVER (ORDER BY cents) AS rs1,
       |         lead(cents) OVER (ORDER BY cents) AS nxt,
       |         sum(cnt0) OVER () AS n0, sum(cnt1) OVER () AS n1
       |  FROM g),
       |m AS (
       |  SELECT any_value(n0) AS n0, any_value(n1) AS n1,
       |         CAST(coalesce(sum(CASE WHEN nxt IS NULL THEN 0
       |           ELSE abs(rs0 * n1 - rs1 * n0) * (nxt - cents) END), 0) AS BIGINT)
       |           AS num
       |  FROM rk)
       |SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
       |       CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN -1 ELSE num END AS BIGINT)
       |         AS w1_num,
       |       CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN -1
       |            ELSE (100 * num) // (n0 * n1) END AS BIGINT) AS w1_c2
       |FROM m""".stripMargin) { (s, dir) =>
    wassersteinOver(TierFiftyFive.armRevenue(s, dir))
  }

  /** KS-ON-GRID — THE shared fold behind the s50 live drift monitor
    * ([[graft.streaming.KsMonitor]]) and its batch replays: the CDF gap
    * against a FROZEN reference, evaluated AT the reference's grid
    * points only. `counts(j)` = live observations in the j-th grid
    * bucket (`(g_{j−1}, g_j]`; j = 0 includes everything ≤ g_0; j =
    * grid-size is the beyond-grid overflow — it never hosts an
    * evaluation point but DOES count in n_live, so rightward mass shift
    * is still seen). `refCum(i)` = reference observations ≤ g_i,
    * strictly positive and non-decreasing with `refCum.last` = n_ref.
    *
    * Returns `(n_live, d_num, d_ppm)` with the q273 cross-multiplied
    * exactness: `d_num = max_i |cumLive_i·n_ref − cumRef_i·n_live|`,
    * `d_ppm = 10⁶·d_num // (n_live·n_ref)`; an empty live OR reference
    * side is the declared −1 (the empty-reference guard runs BEFORE any
    * `refCum.last` read — ADVICE r14). Grid-KS is a LOWER bound of the
    * exact two-sample D and EQUALS it whenever the live values all land
    * on grid points (KsMonitorSpec pins both facts).
    *
    * Overflow discipline (ADVICE r14): a long-running monitor's live
    * counts grow without bound, so the gap products and the 10⁶ ppm
    * scaling fold in BigInt and only the final readouts narrow back to
    * Int64 — exact for any `n_live·n_ref` < 2⁶³/10⁶ ≈ 9.2e12 per-key
    * observations, saturating (never wrapping) beyond. */
  private[graft] def ksGridStep(counts: collection.Map[Int, Long],
      refCum: IndexedSeq[Long]): (Long, Long, Long) = {
    val nLive = counts.valuesIterator.sum
    if (refCum.isEmpty || nLive == 0) return (nLive, -1L, -1L)
    val nRef = refCum.last
    var cum = 0L
    var best = BigInt(0)
    var i = 0
    while (i < refCum.length) {
      cum += counts.getOrElse(i, 0L)
      val gap = (BigInt(cum) * nRef - BigInt(refCum(i)) * nLive).abs
      if (gap > best) best = gap
      i += 1
    }
    val ppm = BigInt(1000000) * best / (BigInt(nLive) * nRef)
    def sat(b: BigInt): Long = if (b > Long.MaxValue) Long.MaxValue else b.toLong
    (nLive, sat(best), sat(ppm))
  }

  val all: Seq[Q] = Seq(q273, q274)
}
