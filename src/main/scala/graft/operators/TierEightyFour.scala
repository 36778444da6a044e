package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 84 (round 13): corpus reporting — the per-source dataset card
  * and term-level burstiness.
  *
  *  - q247: DATASET CARD — the one-stop per-source summary a curator
  *    publishes with a corpus release (the "datasheets for datasets"
  *    shape, Gebru et al. 2021, reduced to its measurable rows): doc
  *    and token counts, tokens-per-doc, type-token ratio (ppm),
  *    distinct languages, and the short-doc count (below the q106
  *    Gopher length floor of 20 tokens). All exact integers; every
  *    column discriminates across the fixture's 20 sources
  *    (FIXTURES.md probe — e.g. src13 carries 4 langs and 5 shorts).
  *  - q248: TERM BURSTINESS (Church & Gale 1995) — per token,
  *    `cf·10⁶ // df`: how many occurrences a document carries GIVEN it
  *    carries one. Bursty terms (content words) repeat within their
  *    documents; spread terms behave like function words. The signal
  *    that separates a rare-but-topical token from a uniformly
  *    sprinkled one where raw df cannot — ordering pinned
  *    (burst DESC, token ASC).
  *
  * Scale: q247 is two partial+final folds over the corpus (per-source
  * scalars + a per-(source, token) distinct for the TTR) — no windows,
  * no joins beyond a broadcast-sized margin; q248 is one
  * per-(token, doc) pre-aggregation (the q33 pre-dedupe trick: cf and
  * df fold from the same grid, no double countDistinct Expand) and a
  * vocabulary-sized output.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus ops.
  */
object TierEightyFour {

  private[graft] val ShortDocTokens = 20L

  val q247 = Q("q247_dataset_card",
    s"""WITH d AS (
       |  SELECT source, lang,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |           AS BIGINT) AS nt
       |  FROM documents),
       |base AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(nt) AS BIGINT) AS n_tokens,
       |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |         CAST(sum(CASE WHEN nt < $ShortDocTokens THEN 1 ELSE 0 END)
       |           AS BIGINT) AS short_docs
       |  FROM d GROUP BY 1),
       |tok AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tk FROM documents),
       |tt AS (SELECT source, CAST(count(DISTINCT tk) AS BIGINT) AS n_types
       |       FROM tok WHERE tk <> '' GROUP BY 1)
       |SELECT base.source, n_docs, n_tokens,
       |       CAST(n_tokens // n_docs AS BIGINT) AS tok_per_doc,
       |       CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
       |       n_langs, short_docs
       |FROM base JOIN tt USING (source)
       |ORDER BY source""".stripMargin) { (s, dir) =>
    cardOver(Tables.load(s, dir, "documents"))
  }

  /** q247's card fold over ANY `(source, lang, text, …)` frame — the
    * extracted library face (`graft_dataset_card` SQL twin). */
  private[graft] def cardOver(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("lang"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("nt"))
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
      countDistinct("lang").as("n_langs"),
      sum(when(col("nt") < ShortDocTokens, 1L).otherwise(0L)).as("short_docs"))
    val tt = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") =!= "")
      .groupBy("source").agg(countDistinct("tk").as("n_types"))
    base.join(tt, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens div n_docs").as("tok_per_doc"),
        expr("(n_types * 1000000) div n_tokens").as("ttr_ppm"),
        col("n_langs"), col("short_docs"))
      .orderBy("source")
  }

  val q248 = Q("q248_term_burstiness",
    """WITH g AS (
      |  SELECT tk, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents)
      |  WHERE tk <> '' GROUP BY 1, 2)
      |SELECT tk AS token, CAST(sum(c) AS BIGINT) AS cf,
      |       CAST(count(*) AS BIGINT) AS df,
      |       CAST(sum(c) * 1000000 // count(*) AS BIGINT) AS burst_ppm
      |FROM g GROUP BY 1
      |ORDER BY burst_ppm DESC, token""".stripMargin) { (s, dir) =>
    burstinessOver(Tables.load(s, dir, "documents"))
  }

  /** q248's burstiness fold over ANY `(doc_id, text, …)` frame — the
    * extracted library face (`graft_burstiness` SQL twin). */
  private[graft] def burstinessOver(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") =!= "")
      .groupBy("tk", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy(col("tk").as("token"))
      .agg(sum("c").as("cf"), count(lit(1)).as("df"))
      .select(col("token"), col("cf"), col("df"),
        expr("(cf * 1000000) div df").as("burst_ppm"))
      .orderBy(col("burst_ppm").desc, col("token"))

  val all: Seq[Q] = Seq(q247, q248)
}
