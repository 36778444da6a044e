package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 100 (round 14): cross-source profile similarity and the dedup
  * cluster provenance audit.
  *
  *  - q279: SOURCE SIMILARITY MATRIX — pairwise cosine between the
  *    sources' token-count profiles (the "which crawls overlap in
  *    register" readout that decides mixture weights and dedup scope).
  *    Dot products and norms are exact Int64 over occurrence counts
  *    (Σcnt_a·cnt_b ≤ vocab·(10⁶)² ≈ 10¹⁶ at sf0.1); only the final
  *    ratio is ONE shared double tree, 6-dp rounded (the Spearman IEEE
  *    rule). The join is token-keyed — |sources|² never materializes
  *    against the vocabulary; the (source, token) aggregate is the only
  *    corpus-sized frame.
  *  - q280: CLUSTER SOURCE PURITY — for each near-dup cluster size, how
  *    concentrated is cluster membership by source? Majority-source
  *    mass over cluster mass, exact ppm, per size band. Purity ≈ 10⁶
  *    means duplication is INTRA-source (dedup per source shard
  *    suffices); low purity means cross-source syndication — the
  *    finding that forces global dedup. Clusters are q55's exact
  *    labels ([[TierFour.minhashPairs]] → [[Components.connected]]);
  *    singletons are excluded (purity is trivially 10⁶ there).
  *
  * Scale: q279 is two partial+final aggs + one token-keyed self-join;
  * q280 adds one (label ⋈ source) shuffle on top of the dedup family's
  * pair + CC machinery (bucketed LSH, contraction rounds — never
  * all-pairs).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus audit
  * ops.
  */
object TierHundred {

  /** Pairwise profile cosine over ANY `(src, token, cnt)` frame:
    * `(src_a, src_b, dot, cos_r6)`, a < b, ordered. */
  private[graft] def profileCosineOver(tc: DataFrame): DataFrame = {
    val s = tc.sparkSession
    val norms = tc.groupBy("src").agg(sum(col("cnt") * col("cnt")).as("q"))
    val a = tc.select(col("src").as("src_a"), col("token"), col("cnt").as("ca"))
    val b = tc.select(col("src").as("src_b"), col("token"), col("cnt").as("cb"))
    a.join(b, Seq("token"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(col("ca") * col("cb")).as("dot"))
      .join(broadcast(norms.select(col("src").as("src_a"), col("q").as("qa"))),
        Seq("src_a"))
      .join(broadcast(norms.select(col("src").as("src_b"), col("q").as("qb"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("dot"),
        round(col("dot").cast("double")
          / (sqrt(col("qa").cast("double")) * sqrt(col("qb").cast("double"))), 6)
          .as("cos_r6"))
      .orderBy("src_a", "src_b")
  }

  val q279 = Q("q279_source_similarity",
    """WITH t0 AS (
      |  SELECT source AS src,
      |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents),
      |tc AS (
      |  SELECT src, token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM t0 GROUP BY 1, 2),
      |norms AS (SELECT src, CAST(sum(cnt * cnt) AS BIGINT) AS q FROM tc GROUP BY 1),
      |dots AS (
      |  SELECT a.src AS src_a, b.src AS src_b,
      |         CAST(sum(a.cnt * b.cnt) AS BIGINT) AS dot
      |  FROM tc a JOIN tc b ON a.token = b.token AND a.src < b.src
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, dot,
      |       round(CAST(dot AS DOUBLE)
      |         / (sqrt(CAST(na.q AS DOUBLE)) * sqrt(CAST(nb.q AS DOUBLE))), 6)
      |         AS cos_r6
      |FROM dots JOIN norms na ON na.src = dots.src_a
      |          JOIN norms nb ON nb.src = dots.src_b
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    profileCosineOver(Tables.load(s, dir, "documents")
      .select(col("source").as("src"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
      .groupBy("src", "token").agg(count(lit(1)).as("cnt")))
  }

  /** Purity table over ANY `(id, lbl)` labels + `(id, src)` provenance:
    * `(csize, n_clusters, maj_ppm)` for csize ≥ 2, ordered. */
  private[graft] def purityOver(labels: DataFrame, prov: DataFrame): DataFrame =
    labels.join(prov, Seq("id"))
      .groupBy("lbl", "src").agg(count(lit(1)).as("cnt"))
      .groupBy("lbl").agg(sum("cnt").as("csize"), max("cnt").as("maj"))
      .filter(col("csize") >= 2)
      .groupBy("csize")
      .agg(count(lit(1)).as("n_clusters"),
        expr("(1000000 * sum(maj)) div sum(csize)").as("maj_ppm"))
      .orderBy("csize")

  val q280 = Q("q280_cluster_purity",
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
       |ls AS (
       |  SELECT l.lbl, d.source AS src, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lab l JOIN documents d ON d.doc_id = l.id GROUP BY 1, 2),
       |cl AS (
       |  SELECT lbl, CAST(sum(cnt) AS BIGINT) AS csize,
       |         CAST(max(cnt) AS BIGINT) AS maj
       |  FROM ls GROUP BY 1)
       |SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST((1000000 * sum(maj)) // sum(csize) AS BIGINT) AS maj_ppm
       |FROM cl WHERE csize >= 2
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val labels = Components.connected(
        docs.select(col("doc_id").as("id")),
        TierFour.minhashPairs(TextOps.tok(s, dir))
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    purityOver(labels,
      docs.select(col("doc_id").as("id"), col("source").as("src")))
  }

  val all: Seq[Q] = Seq(q279, q280)
}
