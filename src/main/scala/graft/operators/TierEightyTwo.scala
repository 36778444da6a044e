package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 82 (round 13): privacy distance + numeric-integrity audits.
  *
  *  - q243: t-CLOSENESS (Li, Li & Venkatasubramanian, ICDE 2007) — the
  *    third leg of the privacy triad (q232 k-anonymity, q238
  *    l-diversity): per quasi-identifier group (lang, n_chars//50 — the
  *    q238 QI; FIXTURES.md: (lang, source) is degenerate), the TOTAL
  *    VARIATION distance between the group's sensitive-attribute
  *    (source) distribution and the corpus-wide one, in exact-integer
  *    ppm: `tv_ppm = Σ_s |c_{g,s}·N − n_g·C_s| · 10⁶ // (2·n_g·N)`
  *    (cross-multiplied — no per-cell division), flagged at t = 0.4.
  *    k-anonymity says a group is big enough, l-diversity says it is
  *    varied enough; t-closeness says its MIX doesn't leak — a group
  *    can pass both and still be dominated by one source (the fixture
  *    spans tv 0.25..0.95, both flag states live; spec-pinned).
  *  - q244: BENFORD FIRST-DIGIT AUDIT (Benford 1938; Hill 1995) — the
  *    classic fabricated-numbers screen over o_totalprice: observed
  *    first-significant-digit shares vs `round(10⁶·log₁₀(1+1/d))`
  *    literals (computed once in Scala, shared verbatim — the
  *    [[TierSixtyEight.LcEst]] cross-libm rule), per-digit
  *    `dev_ppm = |obs_ppm − exp_ppm|` flagged at 40000 ppm. The
  *    fixture's uniform price generator is exactly what Benford flags
  *    (digits 1–4 uniform near 22 %, 5–9 starved): 1–6 flag, 7–9 stay
  *    under — both states live (spec-pinned). floor() before the
  *    BIGINT cast on BOTH engines (DuckDB rounds decimal casts, Spark
  *    truncates — the FIXTURES.md rule).
  *
  * Scale: q243 is two partial+final counts (cells, groups) against a
  * broadcast source margin — the grid is |groups|·|sources| rows, never
  * data-scale; q244 is one count by digit + a 1-row total. Int64
  * envelope (q243): `c·N ≤ N²` — ×10⁶ wraps past N ≈ 3·10⁶ rows; route
  * the two products through DECIMAL(38,0) beyond that (the q137/BM25
  * dispatch precedent), flags unchanged.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star privacy /
  * integrity ops.
  */
object TierEightyTwo {

  private[graft] val TvThrPpm = 400000L
  private[graft] val DevThrPpm = 40000L

  /** Benford expectations `round(10⁶·log₁₀(1+1/d))`, d = 1..9 —
    * computed here once, shared verbatim by both engines. */
  private[graft] val BenfordExp: IndexedSeq[(Long, Long)] =
    (1 to 9).map(d => d.toLong -> BigDecimal(1e6 * math.log10(1.0 + 1.0 / d))
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLongExact)

  private def benfordSql: String =
    BenfordExp.map { case (d, e) => s"($d, $e)" }.mkString(", ")

  val q243 = Q("q243_t_closeness",
    s"""WITH g AS (
       |  SELECT lang, length(text) // 50 AS cb, source FROM documents),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
       |gs AS (SELECT source, CAST(count(*) AS BIGINT) AS cs FROM g GROUP BY 1),
       |grp AS (SELECT lang, cb, CAST(count(*) AS BIGINT) AS ng FROM g GROUP BY 1, 2),
       |cell AS (SELECT lang, cb, source, CAST(count(*) AS BIGINT) AS c
       |         FROM g GROUP BY 1, 2, 3)
       |SELECT grp.lang, CAST(grp.cb AS BIGINT) AS cb, grp.ng,
       |       CAST(sum(abs(coalesce(cell.c, 0) * tot.n - gs.cs * grp.ng)) * 1000000
       |            // (2 * grp.ng * tot.n) AS BIGINT) AS tv_ppm,
       |       CAST(CASE WHEN sum(abs(coalesce(cell.c, 0) * tot.n - gs.cs * grp.ng))
       |                      * 1000000 > $TvThrPpm * (2 * grp.ng * tot.n)
       |            THEN 1 ELSE 0 END AS BIGINT) AS leaky
       |FROM grp CROSS JOIN tot CROSS JOIN gs
       |LEFT JOIN cell ON cell.lang = grp.lang AND cell.cb = grp.cb
       |              AND cell.source = gs.source
       |GROUP BY 1, 2, 3, tot.n
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val g = Tables.load(s, dir, "documents")
      .select(col("lang"),
        expr("CAST(length(text) AS BIGINT) div 50").as("cb"), col("source"))
    val tot = g.agg(count(lit(1)).as("n"))
    val gs = g.groupBy("source").agg(count(lit(1)).as("cs"))
    val grp = g.groupBy("lang", "cb").agg(count(lit(1)).as("ng"))
    val cell = g.groupBy("lang", "cb", "source").agg(count(lit(1)).as("c"))
    grp.crossJoin(broadcast(tot)).crossJoin(broadcast(gs))
      .join(cell, Seq("lang", "cb", "source"), "left")
      .select(col("lang"), col("cb"), col("ng"), col("n"),
        abs(coalesce(col("c"), lit(0L)) * col("n") - col("cs") * col("ng"))
          .as("term"))
      .groupBy("lang", "cb", "ng", "n")
      .agg(sum("term").as("ts"))
      .select(col("lang"), col("cb"), col("ng"),
        expr("(ts * 1000000) div (2 * ng * n)").as("tv_ppm"),
        when(col("ts") * 1000000L > lit(TvThrPpm) * (lit(2L) * col("ng") * col("n")),
          1L).otherwise(0L).as("leaky"))
      .orderBy("lang", "cb")
  }

  val q244 = Q("q244_benford_audit",
    s"""WITH v AS (
       |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS p
       |  FROM orders WHERE o_totalprice > 0),
       |d AS (SELECT CAST(left(CAST(p AS VARCHAR), 1) AS BIGINT) AS dig,
       |             CAST(count(*) AS BIGINT) AS n
       |      FROM v GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d),
       |e AS (SELECT * FROM (VALUES $benfordSql) AS be(dig, exp_ppm))
       |SELECT e.dig, CAST(coalesce(d.n, 0) AS BIGINT) AS n,
       |       CAST(coalesce(d.n, 0) * 1000000 // tot AS BIGINT) AS obs_ppm,
       |       CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
       |       CAST(abs(coalesce(d.n, 0) * 1000000 // tot - e.exp_ppm) AS BIGINT)
       |         AS dev_ppm,
       |       CAST(CASE WHEN abs(coalesce(d.n, 0) * 1000000 // tot - e.exp_ppm)
       |                      > $DevThrPpm THEN 1 ELSE 0 END AS BIGINT) AS deviant
       |FROM e LEFT JOIN d USING (dig) CROSS JOIN t
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 0)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
        1, 1).cast("long").as("dig"))
      .groupBy("dig").agg(count(lit(1)).as("n"))
    val t = d.agg(sum("n").as("tot"))
    val e = BenfordExp.toDF("dig", "exp_ppm")
    broadcast(e).join(d, Seq("dig"), "left").crossJoin(broadcast(t))
      .select(col("dig"), coalesce(col("n"), lit(0L)).as("n"),
        expr("coalesce(n, 0) * 1000000 div tot").as("obs_ppm"), col("exp_ppm"))
      .select(col("dig"), col("n"), col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
      .withColumn("deviant",
        when(col("dev_ppm") > DevThrPpm, 1L).otherwise(0L))
      .orderBy("dig")
  }

  val all: Seq[Q] = Seq(q243, q244)
}
