package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 87 (round 13): distribution-level corpus association — how far
  * a slice's token usage sits from the rest, and whether two metadata
  * dimensions are independent.
  *
  *  - q253: HELLINGER CORPUS DRIFT (Bhattacharyya 1943; Hellinger 1909)
  *    — per language, the Bhattacharyya coefficient between the lang's
  *    TOKEN-FREQUENCY distribution and the leave-one-out rest of the
  *    corpus, and the Hellinger distance √(1−BC). The log-free
  *    alternative to KL/Jensen–Shannon (libm `ln` is not bit-stable
  *    across engines — the q219 lesson): every per-token term is
  *    `floor(10⁶·√(c_t·(g_t−c_t)))` — int→double casts, one double
  *    multiply, one `sqrt`, one multiply, one `floor`, ALL
  *    IEEE-identical — summed as an exact BIGINT (a raw float Σ over
  *    the vocabulary would be addend-order-dependent and hash-unstable;
  *    the scaled-integer sum is order-free). By Cauchy–Schwarz the
  *    floored BC never exceeds 1, so √(1−BC) is always real.
  *  - q254: CRAMÉR'S V ASSOCIATION AUDIT (Cramér 1946) — is `lang`
  *    independent of `source`? χ² over the FULL lang×source grid
  *    (empty combinations included, as the statistic requires), each
  *    cell's term the exact integer `⌊10⁶·(O·N − r·c)²/(r·c·N)⌋`
  *    (BigInt driver closure over the collected grid — the q231/q166
  *    bounded-read convention, |lang|·|source| cells; oracle side
  *    HUGEINT, exact to N ≈ 10⁸ under the 10⁶ ppm scale — past that,
  *    drop the scale or keep the BigInt path), then
  *    V = √(χ²/(N·min(r−1,c−1))), rounded 6 dp via the same
  *    round-column pair every float query uses.
  *
  * Scale: q253 is two keyed aggregations — (lang, token) counts, then a
  * vocabulary-keyed broadcast join back — nothing pairwise, nothing
  * collected. q254's distributed stage is one grid count; the driver
  * closure reads |lang|·|source| cells (the QI-cardinality bound,
  * q232's dimension).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus-audit
  * ops.
  */
object TierEightySeven {

  /** Per-group Bhattacharyya/Hellinger vs the leave-one-out rest, over
    * ANY `(grp, token)` token-instance frame — the extracted library
    * face (`graft_hellinger` SQL twin). Output
    * `(grp, n_tok, bc_scaled, bc_r6, hellinger_r6)`; a group that IS
    * the whole corpus has no rest: declared BC = 0, H = 1. */
  private[graft] def hellingerOver(tk: DataFrame): DataFrame = {
    val c = tk.groupBy("grp", "token").agg(count(lit(1)).as("c"))
    val g = c.groupBy("token").agg(sum("c").as("g"))
    val nl = c.groupBy(col("grp").as("grp_n")).agg(sum("c").as("nl"))
    val n = c.agg(sum("c").as("n"))
    val b = c.join(broadcast(g), "token")
      .select(col("grp"),
        floor(lit(1e6) * sqrt(col("c").cast("double") *
          (col("g") - col("c")).cast("double"))).as("term"))
      .groupBy("grp").agg(sum("term").as("bc_scaled"))
    val den = lit(1e6) *
      sqrt(col("nl").cast("double") * (col("n") - col("nl")).cast("double"))
    val bc = col("bc_scaled").cast("double") / den
    nl.join(b, col("grp_n") === col("grp")).crossJoin(broadcast(n))
      .select(col("grp_n").as("grp"), col("nl").as("n_tok"), col("bc_scaled"),
        when(col("n") - col("nl") === 0, lit(0.0))
          .otherwise(round(bc, 6)).as("bc_r6"),
        when(col("n") - col("nl") === 0, lit(1.0))
          .otherwise(round(sqrt(lit(1.0) - bc), 6)).as("hellinger_r6"))
      .orderBy("grp")
  }

  val q253 = Q("q253_hellinger_drift",
    """WITH tk AS (
      |  SELECT lang AS grp, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |c AS (SELECT grp, token, CAST(count(*) AS BIGINT) AS c
      |      FROM tk WHERE token <> '' GROUP BY 1, 2),
      |g AS (SELECT token, CAST(sum(c) AS BIGINT) AS g FROM c GROUP BY 1),
      |nl AS (SELECT grp, CAST(sum(c) AS BIGINT) AS nl FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
      |b AS (
      |  SELECT c.grp,
      |         CAST(sum(CAST(floor(1000000.0 * sqrt(
      |           CAST(c.c AS DOUBLE) * CAST(g.g - c.c AS DOUBLE))) AS BIGINT))
      |           AS BIGINT) AS bc_scaled
      |  FROM c JOIN g USING (token) GROUP BY 1)
      |SELECT nl.grp AS grp, nl.nl AS n_tok, b.bc_scaled,
      |       CASE WHEN n.n - nl.nl = 0 THEN 0.0
      |            ELSE round(bc_scaled / (1000000.0 * sqrt(
      |              CAST(nl.nl AS DOUBLE) * CAST(n.n - nl.nl AS DOUBLE))), 6)
      |       END AS bc_r6,
      |       CASE WHEN n.n - nl.nl = 0 THEN 1.0
      |            ELSE round(sqrt(1.0 - bc_scaled / (1000000.0 * sqrt(
      |              CAST(nl.nl AS DOUBLE) * CAST(n.n - nl.nl AS DOUBLE)))), 6)
      |       END AS hellinger_r6
      |FROM nl JOIN b ON b.grp = nl.grp CROSS JOIN n
      |ORDER BY nl.grp""".stripMargin) { (s, dir) =>
    hellingerOver(Tables.load(s, dir, "documents")
      .select(col("lang").as("grp"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("token")))
  }

  /** BigInt closure over the full contingency grid: exact ppm-scaled χ²
    * (per-cell floor, matching the oracle's HUGEINT `//`). `cells` maps
    * (row, col) → observed count; absent combinations count 0. */
  private[graft] def chi2Ppm(cells: Map[(String, String), Long]): Long = {
    val rTot = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.map(BigInt(_)).sum }
    val cTot = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.map(BigInt(_)).sum }
    val n = rTot.values.sum
    if (n == 0) return 0L
    // keys.toSeq, NOT keys: yielding from Set × Set builds a SET of terms,
    // silently deduplicating equal χ² contributions from different cells
    val terms = for (r <- rTot.keys.toSeq; c <- cTot.keys.toSeq) yield {
      val o = BigInt(cells.getOrElse((r, c), 0L))
      val d = o * n - rTot(r) * cTot(c)
      d * d * 1000000 / (rTot(r) * cTot(c) * n)
    }
    terms.sum.toLong
  }

  val q254 = Q("q254_cramers_v",
    """WITH o AS (
      |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
      |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
      |grid AS (
      |  SELECT r.lang, c.source, r.r, c.c, coalesce(o.o, 0) AS o
      |  FROM r CROSS JOIN c
      |  LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
      |t AS (
      |  SELECT CAST(sum((d * d * 1000000) // (rr * cc * nn)) AS BIGINT) AS chi2_ppm
      |  FROM (SELECT CAST(grid.r AS HUGEINT) AS rr, CAST(grid.c AS HUGEINT) AS cc,
      |               CAST(n.n AS HUGEINT) AS nn,
      |               CAST(grid.o AS HUGEINT) * n.n
      |                 - CAST(grid.r AS HUGEINT) * grid.c AS d
      |        FROM grid CROSS JOIN n)),
      |k AS (SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS nr,
      |             CAST((SELECT count(*) FROM c) AS BIGINT) AS nc)
      |SELECT n.n AS n_docs, k.nr AS n_langs, k.nc AS n_sources, t.chi2_ppm,
      |       CASE WHEN least(k.nr, k.nc) <= 1 OR n.n = 0 THEN 0.0
      |            ELSE round(sqrt(CAST(t.chi2_ppm AS DOUBLE) /
      |              (1000000.0 * n.n * (least(k.nr, k.nc) - 1))), 6)
      |       END AS cramers_v_r6
      |FROM n, k, t""".stripMargin) { (s, dir) =>
    import s.implicits._
    val cells = Tables.load(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      .collect() // bounded: |lang| × |source| cells (the q232 QI dimension)
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nDocs = cells.values.sum
    val nLangs = cells.keys.map(_._1).toSeq.distinct.size.toLong
    val nSources = cells.keys.map(_._2).toSeq.distinct.size.toLong
    Seq((nDocs, nLangs, nSources, chi2Ppm(cells)))
      .toDF("n_docs", "n_langs", "n_sources", "chi2_ppm")
      .withColumn("cramers_v_r6",
        when(least(col("n_langs"), col("n_sources")) <= 1 || col("n_docs") === 0,
          lit(0.0))
          .otherwise(round(sqrt(col("chi2_ppm").cast("double") /
            (lit(1e6) * col("n_docs").cast("double") *
              (least(col("n_langs"), col("n_sources")) - 1).cast("double"))), 6)))
  }

  val all: Seq[Q] = Seq(q253, q254)
}
