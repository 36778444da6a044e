package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 78 (round 12, twenty-fifth wave): rank fusion and the
  * grouping-sets reporting surface.
  *
  *  - q235: RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher,
  *    SIGIR 2009) — the standard zero-training way to combine rankers:
  *    `rrf(d) = Σ_runs 10⁹ // (60 + rank_run(d))` over the q216 BM25
  *    ranking (lexical relevance for the eval terms) and a
  *    lexical-diversity ranking (type-token ratio — the quality prior),
  *    top-[[FuseK]] each. Integer surrogate: 10⁹ // (60 + r) is
  *    rank-equivalent to the 1/(60+r) real (strictly decreasing in r,
  *    and distinct for every rank ≤ K ≪ √10⁹), so the fused ORDER is
  *    exactly RRF's; ties pinned doc_id ASC. The fold is driver-side
  *    over the two ≤ K-id rank lists (the q216 bounded-read
  *    convention — rank lists ARE metadata).
  *  - q236: CALIBRATION AUDIT (the reliability table) — q83's
  *    classifier scores cut at exact count-deciles (the q120 rank
  *    convention: `(rnk−1)·10 div n` over `score_c DESC, doc_id` —
  *    never ntile), each decile reporting its score envelope AND the
  *    positive rate of an INDEPENDENT label (q231's lexical-diversity
  *    rater): where q120 asks "what does the model select for?", this
  *    asks "does the score RANK what the label measures?" — the
  *    monotonicity (or, on this stand-in model, its absence) a team
  *    reads before trusting q105's score threshold as a quality gate.
  *    All integer: rank two-pass, per-decile partial+final fold,
  *    pos_ppm truncating.
  *
  * Scale: q235's rankers are a broadcast-term tf join (q82's shape)
  * and a per-doc projection + TakeOrdered — no global sort; the fusion
  * itself touches 2K ids. q236 is the q83 scoring plan + the two-pass
  * rank + one 10-group fold — no per-row window, no global sort.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star retrieval /
  * model-ops queries.
  */
object TierSeventyEight {

  private[graft] val FuseK = 20
  private val RrfC = 60L
  private val RrfScale = 1000000000L

  /** The TTR (quality-prior) top-k ranking: (doc_id, ttr_ppm), ties
    * doc_id ASC — shared with the spec. */
  private[graft] def ttrTopK(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n_tok"),
        size(array_distinct(filter(split(col("text"), " "), x => x =!= "")))
          .cast("long").as("n_uniq"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), expr("(n_uniq * 1000000) div n_tok").as("ttr_ppm"))
      .orderBy(col("ttr_ppm").desc, col("doc_id").asc)
      .limit(k)

  val q235 = Q("q235_rrf_fusion",
    s"""WITH toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
       |               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_toks),
       |q AS (SELECT unnest(['dup', 'spark', 'merge']) AS token),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |       FROM toks JOIN q USING (token) GROUP BY 1, 2),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |bm AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS pos
       |  FROM (
       |    SELECT doc_id,
       |           sum((tf * 2200 * ((n * 1000000) // df)) //
       |               (tf * 1000 +
       |                (1200 * (250 + (750 * ((dl * 1000) // (total_toks // n))) // 1000)) // 1000))
       |             AS score
       |    FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN tot
       |    GROUP BY 1)
       |  QUALIFY pos <= $FuseK),
       |tq AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY ttr_ppm DESC, doc_id) AS BIGINT) AS pos
       |  FROM (
       |    SELECT doc_id,
       |           (CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) * 1000000)
       |             // CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ttr_ppm
       |    FROM documents
       |    WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0)
       |  QUALIFY pos <= $FuseK),
       |fused AS (
       |  SELECT coalesce(bm.doc_id, tq.doc_id) AS doc_id,
       |         CAST(coalesce(bm.pos, 0) AS BIGINT) AS bm_rank,
       |         CAST(coalesce(tq.pos, 0) AS BIGINT) AS ttr_rank,
       |         CAST(coalesce($RrfScale // ($RrfC + bm.pos), 0)
       |              + coalesce($RrfScale // ($RrfC + tq.pos), 0) AS BIGINT) AS rrf
       |  FROM bm FULL OUTER JOIN tq ON tq.doc_id = bm.doc_id)
       |SELECT doc_id, bm_rank, ttr_rank, rrf FROM (
       |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused)
       |WHERE rk <= $FuseK ORDER BY rrf DESC, doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    // both rank lists are ≤ FuseK ids — metadata-scale driver reads
    val bm = TierSixtySix.bm25TopK(s, dir, TierSixtySix.EvalTerms, FuseK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val tq = ttrTopK(docs, FuseK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val bmRank = bm.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val tqRank = tq.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val fused = (bm ++ tq).distinct.map { id =>
      val (rb, rt) = (bmRank.getOrElse(id, 0L), tqRank.getOrElse(id, 0L))
      val rrf = (if (rb > 0) RrfScale / (RrfC + rb) else 0L) +
        (if (rt > 0) RrfScale / (RrfC + rt) else 0L)
      (id, rb, rt, rrf)
    }.sortBy(t => (-t._4, t._1)).take(FuseK)
    fused.toDF("doc_id", "bm_rank", "ttr_rank", "rrf")
  }

  import TierFour.{A0, B0, P}

  val q236 = Q("q236_calibration",
    s"""WITH toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |vocab AS (
       |  SELECT token, row_number() OVER (ORDER BY token) AS tid
       |  FROM (SELECT DISTINCT token FROM toks)),
       |wts AS (
       |  SELECT b AS bucket,
       |         CAST(((b * $A0 + $B0) % $P) % 2001 - 1000 AS BIGINT) AS w
       |  FROM (SELECT unnest(range(4096)) AS b)),
       |feat AS (
       |  SELECT doc_id, ((tid % $P) * $A0 + $B0) % $P % 4096 AS bucket
       |  FROM toks JOIN vocab USING (token)),
       |sc AS (
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_c
       |  FROM feat JOIN wts USING (bucket) GROUP BY 1),
       |lab AS (
       |  SELECT doc_id,
       |         CASE WHEN CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) * 100
       |                   >= CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))  AS BIGINT) * 45
       |              THEN 1 ELSE 0 END AS pos
       |  FROM documents),
       |rk AS (
       |  SELECT d.doc_id, coalesce(sc.score_c, 0) AS score_c, lab.pos,
       |         CAST(row_number() OVER (ORDER BY coalesce(sc.score_c, 0) DESC,
       |                                 d.doc_id) AS BIGINT) AS rnk
       |  FROM documents d LEFT JOIN sc USING (doc_id) JOIN lab USING (doc_id)),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
       |SELECT (rnk - 1) * 10 // n.n AS decile,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(min(score_c) AS BIGINT) AS lo_c,
       |       CAST(max(score_c) AS BIGINT) AS hi_c,
       |       CAST(sum(pos) AS BIGINT) AS n_pos,
       |       CAST((sum(pos) * 1000000) // count(*) AS BIGINT) AS pos_ppm
       |FROM rk CROSS JOIN n GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val scored = TierEleven.classifierScoresOf(docs)
      .join(TierSeventySix.raterFlags(docs).select(col("doc_id"), col("b").as("pos")),
        "doc_id")
    val n = docs.agg(count(lit(1)).as("n"))
    Cumulative.rowNumber(s, scored,
        Seq(col("score_c").desc, col("doc_id").asc), "rnk")
      .crossJoin(broadcast(n))
      .groupBy(expr("(rnk - 1) * 10 div n").as("decile"))
      .agg(count(lit(1)).as("n_docs"), min("score_c").as("lo_c"),
        max("score_c").as("hi_c"), sum("pos").as("n_pos"))
      .select(col("decile"), col("n_docs"), col("lo_c"), col("hi_c"),
        col("n_pos"), expr("(n_pos * 1000000) div n_docs").as("pos_ppm"))
      .orderBy("decile")
  }

  val all: Seq[Q] = Seq(q235, q236)
}
