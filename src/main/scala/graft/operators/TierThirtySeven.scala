package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 37 (round 10, ninth wave): the dedup REPORTING layer — the two
  * tables a curator reads before approving a dedup run.
  *
  *  - q158: CROSS-SOURCE LEAKAGE MATRIX — q26's MinHash near-dup pairs
  *    rolled up by unordered source pair: "which sources copy which"
  *    (the off-diagonal is inter-source contamination — shared scrapes,
  *    mirrors; the diagonal is in-source redundancy). The decision
  *    input for per-source dedup policy and for train/eval source
  *    separation.
  *  - q159: DEDUP SAVINGS REPORT — per source, what cluster-level dedup
  *    (q55's components, keep each cluster's min doc_id) would actually
  *    remove: docs and whitespace tokens before/after. The cost-benefit
  *    table ("dedup drops 7 % of src3's tokens") that justifies the run.
  *
  * Scale: both ride existing machinery — the LSH pair stage is banded
  * (never all-pairs), the rollups are partial+final on pair/doc counts;
  * q159's clustering is [[Components]] (O(diameter) rounds, contraction
  * + bounded endgame).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star reporting ops.
  */
object TierThirtySeven {

  val q158 = Q("q158_leakage_matrix",
    s"""WITH pairs AS (${TierFour.minhashSql("documents")}),
       |lab AS (
       |  SELECT p.doc_a, p.doc_b, da.source AS sa, db.source AS sb
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b)
       |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    leakageOver(docs, TierFour.minhashPairs(TextOps.tok(s, dir)))
  }

  /** q158's report body over prebuilt near-dup `pairs(doc_a, doc_b, …)` —
    * the [[Dedup.leakageMatrix]] face (bit-for-bit equal to the declared
    * query — DedupArtifactsSpec). */
  private[graft] def leakageOver(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  val q159 = Q("q159_dedup_savings",
    s"""WITH RECURSIVE
       |pairs AS (${TierFour.minhashSql("documents")}),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT doc_id AS id FROM documents),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |tok AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |           AS nt
       |  FROM documents)
       |SELECT t.source,
       |       CAST(count(*) AS BIGINT) AS docs_before,
       |       CAST(sum(CASE WHEN l.lbl = t.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |         AS docs_after,
       |       CAST(sum(t.nt) AS BIGINT) AS tokens_before,
       |       CAST(sum(CASE WHEN l.lbl = t.doc_id THEN t.nt ELSE 0 END) AS BIGINT)
       |         AS tokens_after
       |FROM tok t JOIN lab l ON l.id = t.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val pairs = TierFour.minhashPairs(TextOps.tok(s, dir))
    val lab = Components.connected(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    savingsOver(docs, lab)
  }

  /** q159's savings body over prebuilt `lab(id, lbl)` cluster labels —
    * the [[Dedup.savings]] face (bit-for-bit equal to the declared
    * query — DedupArtifactsSpec). */
  private[graft] def savingsOver(docs: DataFrame, lab: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("nt"))
    tok.join(lab.select(col("id").as("doc_id"), col("lbl")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("docs_before"),
        sum(when(col("lbl") === col("doc_id"), 1L).otherwise(0L)).as("docs_after"),
        sum("nt").as("tokens_before"),
        sum(when(col("lbl") === col("doc_id"), col("nt")).otherwise(0L))
          .as("tokens_after"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(q158, q159)
}
