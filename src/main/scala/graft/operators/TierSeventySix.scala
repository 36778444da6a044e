package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 76 (round 12, twenty-fifth wave): label-quality and
  * release-privacy audits — two gates a corpus passes between curation
  * and release.
  *
  *  - q231: INTER-RATER AGREEMENT (Cohen 1960's kappa) — two cheap
  *    deterministic quality raters over every doc (A: length gate,
  *    n_tok ≥ 56; B: lexical-diversity gate, type-token ratio ≥ 45 %),
  *    folded to the 2×2 agreement table and closed to
  *    `kappa_ppm = 10⁶·(n·(a+d) − E) / (n² − E)` with
  *    `E = (a+b)(a+c) + (c+d)(b+d)` — observed-vs-chance agreement,
  *    ALL integer (truncating division toward zero in both engines,
  *    q198's signed-division law; the numerator goes NEGATIVE when the
  *    raters disagree more than chance — this fixture's case, the
  *    "your two quality filters are fighting" signal a curator needs
  *    before unioning their keep-sets). Driver closure in BigInt over
  *    the four cells (n² wraps Int64 past ~3·10⁹ docs — the q166
  *    convention; oracle side HUGEINT).
  *  - q232: K-ANONYMITY AUDIT (Sweeney 2002) — group sizes over the
  *    quasi-identifier pair (lang, source): any doc in a group smaller
  *    than k = 5 is re-identifiable by its metadata alone; the audit
  *    table lists every QI group with its size and anonymity flag,
  *    plus the suppression cost (`ppm` of the corpus a k-anonymous
  *    release would drop). The pre-release privacy gate beside the PII
  *    scrub (q86): q86 cleans the text, this bounds the METADATA.
  *
  * Scale: q231 is one partial+final 4-scalar agg (the 2×2 collapses
  * map-side); q232 is one keyed count over a low-cardinality QI pair —
  * nothing global, nothing sorted beyond the audit table's output
  * order.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus-audit
  * ops.
  */
object TierSeventySix {

  private[graft] val KAnon = 5L
  private val LenThr = 56L
  private val TtrPct = 45L

  /** The two raters' flags per doc — shared by q231 and its spec. */
  private[graft] def raterFlags(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n_tok"),
        size(array_distinct(filter(split(col("text"), " "), x => x =!= "")))
          .cast("long").as("n_uniq"))
      .select(col("doc_id"),
        when(col("n_tok") >= LenThr, 1L).otherwise(0L).as("a"),
        when(col("n_uniq") * 100 >= col("n_tok") * TtrPct, 1L).otherwise(0L).as("b"))

  /** BigInt closure over the 2×2: (n, a, b, c, d) → kappa_ppm. */
  private[graft] def kappaPpm(a: Long, b: Long, c: Long, d: Long): Long = {
    val n = BigInt(a) + b + c + d
    val e = (BigInt(a) + b) * (BigInt(a) + c) + (BigInt(c) + d) * (BigInt(b) + d)
    val den = n * n - e
    if (den == 0) 1000000L // both raters constant: define kappa = 1 (po = pe)
    else ((BigInt(1000000) * (n * (BigInt(a) + d) - e)) / den).toLong
  }

  val q231 = Q("q231_rater_kappa",
    s"""WITH f AS (
       |  SELECT doc_id,
       |         CASE WHEN CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |                   >= $LenThr THEN 1 ELSE 0 END AS a,
       |         CASE WHEN CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) * 100
       |                   >= $TtrPct * CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |              THEN 1 ELSE 0 END AS b
       |  FROM documents),
       |t AS (
       |  SELECT CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS pp,
       |         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS pn,
       |         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS np,
       |         CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nn
       |  FROM f),
       |k AS (
       |  SELECT pp, pn, np, nn, pp + pn + np + nn AS n,
       |         (pp + pn) * (pp + np) + (np + nn) * (pn + nn) AS e
       |  FROM t)
       |SELECT CAST(n AS BIGINT) AS n_docs,
       |       CAST(pp AS BIGINT) AS both_pos, CAST(pn AS BIGINT) AS a_only,
       |       CAST(np AS BIGINT) AS b_only, CAST(nn AS BIGINT) AS both_neg,
       |       CAST(CASE WHEN n * n - e = 0 THEN 1000000
       |                 ELSE (1000000 * (n * (pp + nn) - e)) // (n * n - e)
       |            END AS BIGINT) AS kappa_ppm
       |FROM k""".stripMargin) { (s, dir) =>
    import s.implicits._
    val t = raterFlags(Tables.load(s, dir, "documents"))
      .agg(sum(when(col("a") === 1L && col("b") === 1L, 1L).otherwise(0L)).as("pp"),
        sum(when(col("a") === 1L && col("b") === 0L, 1L).otherwise(0L)).as("pn"),
        sum(when(col("a") === 0L && col("b") === 1L, 1L).otherwise(0L)).as("np"),
        sum(when(col("a") === 0L && col("b") === 0L, 1L).otherwise(0L)).as("nn"))
      .collect()(0) // the 2×2 is FOUR scalars — the q166 bounded read
    val (pp, pn, np, nn) = (t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3))
    Seq((pp + pn + np + nn, pp, pn, np, nn, kappaPpm(pp, pn, np, nn)))
      .toDF("n_docs", "both_pos", "a_only", "b_only", "both_neg", "kappa_ppm")
  }

  /** q232's audit over ANY frame and quasi-identifier column pair — the
    * extracted library face (`graft_k_anonymity` SQL twin; the
    * Dedup.artifacts sharing convention). Output
    * `(<c1>, <c2>, n_rows, k_anonymous, suppress_ppm)`. */
  private[graft] def kAnonymityOver(df: org.apache.spark.sql.DataFrame,
      c1: String, c2: String, k: Long = KAnon): org.apache.spark.sql.DataFrame = {
    val g = df.groupBy(c1, c2).agg(count(lit(1)).as("n_rows"))
    val n = g.agg(sum("n_rows").as("total"))
    g.crossJoin(broadcast(n))
      .select(col(c1), col(c2), col("n_rows"),
        when(col("n_rows") >= k, 1L).otherwise(0L).as("k_anonymous"),
        when(col("n_rows") >= k, 0L)
          .otherwise(expr("(n_rows * 1000000) div total")).as("suppress_ppm"))
      .orderBy(c1, c2)
  }

  val q232 = Q("q232_k_anonymity",
    s"""WITH g AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM documents GROUP BY 1, 2),
       |n AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM g)
       |SELECT lang, source, n_rows,
       |       CAST(CASE WHEN n_rows >= $KAnon THEN 1 ELSE 0 END AS BIGINT)
       |         AS k_anonymous,
       |       CAST(CASE WHEN n_rows >= $KAnon THEN 0
       |                 ELSE (n_rows * 1000000) // total END AS BIGINT)
       |         AS suppress_ppm
       |FROM g CROSS JOIN n ORDER BY lang, source""".stripMargin) { (s, dir) =>
    kAnonymityOver(Tables.load(s, dir, "documents"), "lang", "source")
  }

  val all: Seq[Q] = Seq(q231, q232)
}
