package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 91 (round 13): lexical concentration and the unseen-mass
  * estimate — how repetitive a slice's vocabulary IS, and how much of
  * it you have NOT seen yet.
  *
  *  - q261: INVERSE-SIMPSON DIVERSITY (Simpson 1949; "effective number
  *    of types" in the ecology literature) — per lang: the repeat
  *    probability λ = Σc²/N² in ppm and the effective vocabulary size
  *    D = N²/Σc² in milli-units. The concentration diagnostic TTR
  *    (q132) cannot give: TTR counts types once each; D weighs them by
  *    mass, so one token absorbing half the corpus shows up as D ≈ 4
  *    even when thousands of types exist. Exact Int64 with the q166
  *    bound (N² wraps past N ≈ 3·10⁹ tokens per group — the DECIMAL
  *    escape applies beyond).
  *  - q262: GOOD–TURING UNSEEN MASS (Good 1953) — per lang: the
  *    singleton (hapax) count N₁ and the Good–Turing estimate of the
  *    probability mass of UNSEEN types, P₀ ≈ N₁/N — the number that
  *    tells a curator whether a slice's vocabulary has converged or
  *    sampling more will keep surfacing new tokens. The natural
  *    31-token fixture has no tail, so the q119 injection applies
  *    VERBATIM (FIXTURES.md §4: `doc_id % 37` appends the doc-unique
  *    `rareid<doc_id>` — a true hapax; `doc_id % 5` appends the shared
  *    `uncommonx` — frequent, and must NOT count).
  *
  * Scale: both are one (lang, token) keyed count plus a per-lang
  * re-aggregation — nothing pairwise, nothing collected.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus-audit
  * ops.
  */
object TierNinetyOne {

  /** Per-group inverse-Simpson over ANY `(grp, token)` instance frame —
    * the extracted library face. Output
    * `(grp, n_tok, n_types, sum_c2, simpson_ppm, ens_milli)`. */
  private[graft] def simpsonOver(tk: DataFrame): DataFrame =
    tk.groupBy("grp", "token").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("grp"), col("n_tok"), col("n_types"), col("sum_c2"),
        expr("(1000000 * sum_c2) div (n_tok * n_tok)").as("simpson_ppm"),
        expr("(1000 * n_tok * n_tok) div sum_c2").as("ens_milli"))
      .orderBy("grp")

  val q261 = Q("q261_inverse_simpson",
    """WITH tk AS (
      |  SELECT lang AS grp, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |c AS (SELECT grp, token, CAST(count(*) AS BIGINT) AS c
      |      FROM tk WHERE token <> '' GROUP BY 1, 2),
      |g AS (
      |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_tok,
      |         CAST(count(*) AS BIGINT) AS n_types,
      |         CAST(sum(c * c) AS BIGINT) AS sum_c2
      |  FROM c GROUP BY 1)
      |SELECT grp, n_tok, n_types, sum_c2,
      |       CAST((1000000 * sum_c2) // (n_tok * n_tok) AS BIGINT) AS simpson_ppm,
      |       CAST((1000 * n_tok * n_tok) // sum_c2 AS BIGINT) AS ens_milli
      |FROM g ORDER BY grp""".stripMargin) { (s, dir) =>
    simpsonOver(Tables.load(s, dir, "documents")
      .select(col("lang").as("grp"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("token")))
  }

  /** Per-group Good–Turing hapax readout over ANY `(grp, token)`
    * instance frame — the extracted library face. Output
    * `(grp, n_tok, n_types, hapax, p0_ppm, hapax_type_ppm)`. */
  private[graft] def goodTuringOver(tk: DataFrame): DataFrame =
    tk.groupBy("grp", "token").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("grp"), col("n_tok"), col("n_types"), col("hapax"),
        expr("(1000000 * hapax) div n_tok").as("p0_ppm"),
        expr("(1000000 * hapax) div n_types").as("hapax_type_ppm"))
      .orderBy("grp")

  val q262 = Q("q262_good_turing",
    """WITH aug AS (
      |  SELECT lang AS grp,
      |         text ||
      |           CASE WHEN doc_id % 37 = 0 THEN ' rareid' || CAST(doc_id AS VARCHAR) ELSE '' END ||
      |           CASE WHEN doc_id % 5 = 0 THEN ' uncommonx' ELSE '' END AS text
      |  FROM documents),
      |tk AS (SELECT grp, unnest(string_split(text, ' ')) AS token FROM aug),
      |c AS (SELECT grp, token, CAST(count(*) AS BIGINT) AS c
      |      FROM tk WHERE token <> '' GROUP BY 1, 2),
      |g AS (
      |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_tok,
      |         CAST(count(*) AS BIGINT) AS n_types,
      |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      |  FROM c GROUP BY 1)
      |SELECT grp, n_tok, n_types, hapax,
      |       CAST((1000000 * hapax) // n_tok AS BIGINT) AS p0_ppm,
      |       CAST((1000000 * hapax) // n_types AS BIGINT) AS hapax_type_ppm
      |FROM g ORDER BY grp""".stripMargin) { (s, dir) =>
    // the q119 injection, verbatim (FIXTURES.md §4): a true hapax per
    // doc_id % 37 doc, a shared frequent token per doc_id % 5 doc
    val aug = Tables.load(s, dir, "documents")
      .select(col("lang").as("grp"), concat(col("text"),
        when(col("doc_id") % 37 === 0,
          concat(lit(" rareid"), col("doc_id").cast("string"))).otherwise(""),
        when(col("doc_id") % 5 === 0, lit(" uncommonx")).otherwise("")).as("text"))
    goodTuringOver(aug.select(col("grp"),
      explode(filter(split(col("text"), " "), x => x =!= "")).as("token")))
  }

  val all: Seq[Q] = Seq(q261, q262)
}
