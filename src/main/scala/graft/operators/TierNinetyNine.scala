package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 99 (round 14): the ordered-dose trend test and the one-token
  * decision stump.
  *
  *  - q277: COCHRAN–ARMITAGE TREND TEST (Cochran 1954, Armitage 1955)
  *    — is the 'F' (fulfilled) rate MONOTONE in order priority? Doses
  *    w = the priority's leading digit (1-URGENT … 5-LOW — an ordinal
  *    the plain χ² ignores). Exact Int64 moments (N, A, Σw·a, Σw·n,
  *    Σw²·n); the statistic is assembled factored —
  *    `z² = N·T² / (A·(N−A) · (N·Σw²n − (Σwn)²))` with
  *    `T = N·Σwa − A·Σwn` — because the UNfactored variance product
  *    reaches ~10²¹ at sf0.1: each factor stays well inside Int64 and
  *    only the final ratio is ONE shared double tree (the q272 IEEE
  *    rule). Degenerate variance (one dose, or all/no successes) is
  *    DECLARED z² = 0.
  *  - q278: GINI-IMPURITY DECISION STUMP (CART, Breiman 1984) — the
  *    best single-token classifier for the document LANGUAGE: for each
  *    of the top-20 document-frequency tokens, split the corpus on
  *    contains(token) and score the split by count-weighted Gini
  *    impurity in exact ppm. Absent-class algebra stays closed over
  *    PRESENT (token, lang) pairs: Σ_c(tot_c − l_c)² = Σtot² −
  *    2Σtot·l + Σl², so the right side never needs a null-filling
  *    join. Fixed-point convention (documented, mirrored verbatim in
  *    the oracle): per-side ppm floors first, the count-weighted mean
  *    floors second. The first row IS the stump.
  *
  * Scale: q277 folds a 5-row dose aggregate. q278 is one distinct
  * (doc, token) projection, a TakeOrdered top-20 (never a full vocab
  * sort), and one candidate×class aggregation — candidates are 20 rows
  * broadcast, classes ≤ |langs|.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation / labeling ops.
  */
object TierNinetyNine {

  /** CA trend over ANY `(w, n, a)` dose aggregate (dose weight, trials,
    * successes): one row `(n_total, a_total, t_wa, t_wn, t_wwn, z2_r6)`. */
  private[graft] def trendOver(d: DataFrame): DataFrame = {
    val m = d.agg(sum("n").as("nn"), sum("a").as("aa"),
      sum(col("w") * col("a")).as("t1"), sum(col("w") * col("n")).as("t2"),
      sum(col("w") * col("w") * col("n")).as("t3"))
    m.select(col("nn").as("n_total"), col("aa").as("a_total"),
      col("t1").as("t_wa"), col("t2").as("t_wn"), col("t3").as("t_wwn"),
      expr(
        """CASE WHEN aa = 0 OR aa = nn OR nn * t3 - t2 * t2 = 0
          |     THEN CAST(0.0 AS DOUBLE)
          |     ELSE round(CAST(nn AS DOUBLE)
          |         * CAST(nn * t1 - aa * t2 AS DOUBLE)
          |         * CAST(nn * t1 - aa * t2 AS DOUBLE)
          |       / (CAST(aa * (nn - aa) AS DOUBLE)
          |          * CAST(nn * t3 - t2 * t2 AS DOUBLE)), 6)
          |END""".stripMargin).as("z2_r6"))
  }

  val q277 = Q("q277_cochran_armitage",
    """WITH d AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS a
      |  FROM orders GROUP BY 1),
      |m AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(a) AS BIGINT) AS aa,
      |         CAST(sum(w * a) AS BIGINT) AS t1,
      |         CAST(sum(w * n) AS BIGINT) AS t2,
      |         CAST(sum(w * w * n) AS BIGINT) AS t3
      |  FROM d)
      |SELECT nn AS n_total, aa AS a_total, t1 AS t_wa, t2 AS t_wn,
      |       t3 AS t_wwn,
      |       CASE WHEN aa = 0 OR aa = nn OR nn * t3 - t2 * t2 = 0
      |            THEN CAST(0.0 AS DOUBLE)
      |            ELSE round(CAST(nn AS DOUBLE)
      |                * CAST(nn * t1 - aa * t2 AS DOUBLE)
      |                * CAST(nn * t1 - aa * t2 AS DOUBLE)
      |              / (CAST(aa * (nn - aa) AS DOUBLE)
      |                 * CAST(nn * t3 - t2 * t2 AS DOUBLE)), 6)
      |       END AS z2_r6
      |FROM m""".stripMargin) { (s, dir) =>
    trendOver(Tables.load(s, dir, "orders")
      .groupBy(substring(col("o_orderpriority"), 1, 1).cast("long").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("a")))
  }

  /** Gini stump over ANY `(doc_id, cls)` label frame + `(doc_id, token)`
    * distinct containment frame, scoring `cands` `(token)` splits:
    * `(token, n_with, gini_ppm)` ordered (gini asc, token asc). */
  private[graft] def giniStumpOver(labels: DataFrame, tok: DataFrame,
      cands: DataFrame): DataFrame = {
    val s = labels.sparkSession
    // class totals + their squares — bounded |classes|-row read
    val tots = labels.groupBy("cls").agg(count(lit(1)).as("tc"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = tots.map(_._2).sum
    val t2 = tots.map(t => t._2 * t._2).sum
    val totDf = broadcast(s.createDataFrame(tots.toSeq).toDF("cls", "tc"))
    tok.join(broadcast(cands), Seq("token"))
      .join(labels, Seq("doc_id"))
      .groupBy("token", "cls").agg(count(lit(1)).as("lc"))
      .join(totDf, Seq("cls"))
      .groupBy("token")
      .agg(sum("lc").as("nl"), sum(col("lc") * col("lc")).as("sl2"),
        sum(col("tc") * col("lc")).as("cx"))
      .select(col("token"), col("nl").as("n_with"),
        expr(
          s"""((CASE WHEN nl = 0 THEN 0
             |  ELSE ((nl * nl - sl2) * 1000000) div nl END)
             |+ (CASE WHEN $n - nl = 0 THEN 0
             |  ELSE ((($n - nl) * ($n - nl) - ($t2 - 2 * cx + sl2))
             |        * 1000000) div ($n - nl) END)) div $n""".stripMargin)
          .as("gini_ppm"))
      .orderBy(col("gini_ppm").asc, col("token").asc)
  }

  val q278 = Q("q278_gini_stump",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '),
      |         x -> x <> '')) AS token
      |  FROM documents),
      |cand AS (
      |  SELECT token FROM tok GROUP BY 1
      |  ORDER BY count(*) DESC, token LIMIT 20),
      |lab AS (SELECT doc_id, lang AS cls FROM documents),
      |tot AS (SELECT cls, CAST(count(*) AS BIGINT) AS tc FROM lab GROUP BY 1),
      |gt AS (SELECT CAST(sum(tc) AS BIGINT) AS n,
      |              CAST(sum(tc * tc) AS BIGINT) AS t2 FROM tot),
      |lc AS (
      |  SELECT t.token, l.cls, CAST(count(*) AS BIGINT) AS lc
      |  FROM tok t JOIN cand USING (token) JOIN lab l USING (doc_id)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT token, CAST(sum(lc) AS BIGINT) AS nl,
      |         CAST(sum(lc * lc) AS BIGINT) AS sl2,
      |         CAST(sum(tc * lc) AS BIGINT) AS cx
      |  FROM lc JOIN tot USING (cls) GROUP BY 1)
      |SELECT token, nl AS n_with,
      |       CAST(((CASE WHEN nl = 0 THEN 0
      |               ELSE ((nl * nl - sl2) * 1000000) // nl END)
      |           + (CASE WHEN n - nl = 0 THEN 0
      |               ELSE (((n - nl) * (n - nl) - (t2 - 2 * cx + sl2))
      |                     * 1000000) // (n - nl) END)) // n AS BIGINT)
      |         AS gini_ppm
      |FROM agg CROSS JOIN gt
      |ORDER BY gini_ppm, token""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
      .distinct()
    val cands = tok.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc).limit(20)
      .select("token")
    giniStumpOver(docs.select(col("doc_id"), col("lang").as("cls")),
      tok, cands)
  }

  val all: Seq[Q] = Seq(q277, q278)
}
