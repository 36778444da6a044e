package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 66 (round 11, fifteenth wave): the experiment-integrity gate
  * and the retrieval-evaluation harness — the check you run BEFORE
  * trusting any A/B readout, and the metrics you run AFTER any ranker
  * change.
  *
  *  - q215: SRM CHECK (sample-ratio mismatch) — the standard
  *    pre-readout integrity gate: did the 50/50 assignment hash
  *    actually split 50/50? χ² on the per-arm DISTINCT-user counts
  *    against the equal expectation: χ² = (n_a−n_b)²/n, alarm at the
  *    95 % df=1 bound via the cross-multiplied integer bit
  *    100·(n_a−n_b)² > 384·n (the q166 convention — no float χ²
  *    anywhere). An SRM fire means the ASSIGNMENT is broken and every
  *    downstream readout (q166/q194–q200) is void — which is why it's
  *    a first-class declared op and not a footnote. The fixture's hash
  *    splits 73/77 at sf0.01 — an honest pass; the spec constructs the
  *    firing branch. BigInt driver closure over two scalars.
  *  - q216: RETRIEVAL EVAL — Precision@10 / Recall@10 / MRR@10 for TWO
  *    rankers against the same relevance labels, ALL EXACT RATIONALS in
  *    ppm (binary relevance sidesteps nDCG's irrational log discounts —
  *    no float ever): relevant = contains the rare term 'dup' (25 of
  *    500 docs), ranker A = BM25 on ('dup','spark','merge') through the
  *    SHARED [[TierEleven.bm25Score]] expression (the q82/q87 single
  *    definition), ranker B = the query-blind length-desc baseline.
  *    The harness's point is the COMPARISON: BM25 fills its top-10 with
  *    relevant docs, the baseline nearly none — six (ranker, metric,
  *    value_ppm) rows a ranking change is judged by.
  *
  * Scale: q215 is one distinct + one two-cell count — the cheapest
  * gate in the suite. q216's rankings are top-10 TakeOrderedAndProject
  * heads (never a global sort materialized), relevance is one keyed
  * semi-join-shaped count, and the metric fold runs driver-side over
  * ≤ 20 collected rows (bounded by k, q198 convention).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation / retrieval ops.
  */
object TierSixtySix {

  import TierFour.{A0, B0, P}

  val q215 = Q("q215_srm_check",
    s"""WITH ua AS (
       |  SELECT DISTINCT user_id,
       |         ((user_id % $P) * $A0 + $B0) % $P % 2 AS arm
       |  FROM events),
       |c AS (SELECT CAST(count(*) FILTER (arm = 0) AS HUGEINT) AS na,
       |             CAST(count(*) FILTER (arm = 1) AS HUGEINT) AS nb
       |      FROM ua)
       |SELECT CAST(na + nb AS BIGINT) AS n_users,
       |       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |       CAST(1000000 * (na - nb) * (na - nb) // (na + nb) AS BIGINT)
       |         AS chi2_ppm,
       |       CAST(CASE WHEN 100 * (na - nb) * (na - nb) > 384 * (na + nb)
       |                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
       |FROM c""".stripMargin) { (s, dir) =>
    srmReport(s, Tables.load(s, dir, "events"))
  }

  /** The SRM fold over any assigned-events frame — the q215 body,
    * exposed so the spec can fire the alarm on a constructed
    * imbalanced assignment. BigInt closure over the two arm counts. */
  private[graft] def srmReport(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
    val r = ev.select("user_id").distinct()
      .withColumn("arm", expr(s"((user_id % $P) * $A0 + $B0) % $P % 2"))
      .agg(count(when(col("arm") === 0, 1)).as("na"),
        count(when(col("arm") === 1, 1)).as("nb"))
      .collect()(0)
    val (na, nb) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)))
    val n = na + nb
    val d2 = (na - nb) * (na - nb)
    Seq((n.toLong, na.toLong, nb.toLong, (BigInt(1000000) * d2 / n).toLong,
        if (BigInt(100) * d2 > BigInt(384) * n) 1L else 0L))
      .toDF("n_users", "n_a", "n_b", "chi2_ppm", "srm_flag")
  }

  /** Eval query terms — 'dup' is the one rare token in the corpus
    * vocabulary (df 25/500; everything else sits near df ≈ 380), so it
    * carries the idf mass and defines a small relevant set. */
  private[graft] val EvalTerms = Seq("dup", "spark", "merge")
  private[graft] val EvalK = 10

  /** BM25 top-k over arbitrary terms through the SHARED scoring
    * expression — the q82 plan shape with the query parametrized. */
  private[graft] def bm25TopK(s: SparkSession, dir: String,
      terms: Seq[String], k: Int): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tot = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum("dl").as("total_toks")))
    val qterms = s.sql(terms.map(t => s"('$t')")
      .mkString("SELECT * FROM VALUES ", ", ", " AS t(token)"))
    val tf = toks.join(broadcast(qterms), "token")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "token").join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("score_t", expr(TierEleven.bm25Score(s)))
      .groupBy("doc_id").agg(sum("score_t").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Exact-rational IR metrics for one ranked id list against a
    * relevant-id set: P@k, Recall@k, MRR@k in ppm. */
  private[graft] def irMetrics(ranked: Seq[Long], relevant: Set[Long],
      k: Int): (Long, Long, Long) = {
    val top = ranked.take(k)
    val hits = top.count(relevant)
    val firstHit = top.indexWhere(relevant)
    (1000000L * hits / k,
      1000000L * hits / relevant.size,
      if (firstHit < 0) 0L else 1000000L / (firstHit + 1))
  }

  val q216 = Q("q216_retrieval_eval",
    s"""WITH toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |rel AS (SELECT DISTINCT doc_id FROM toks WHERE token = 'dup'),
       |nrel AS (SELECT CAST(count(*) AS BIGINT) AS r FROM rel),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
       |               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_toks),
       |q AS (SELECT unnest(['dup', 'spark', 'merge']) AS token),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |       FROM toks JOIN q USING (token) GROUP BY 1, 2),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |bm AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS pos
       |  FROM (
       |    SELECT doc_id,
       |           sum((tf * 2200 * ((n * 1000000) // df)) //
       |               (tf * 1000 +
       |                (1200 * (250 + (750 * ((dl * 1000) // (total_toks // n))) // 1000)) // 1000))
       |             AS score
       |    FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN tot
       |    GROUP BY 1)
       |  QUALIFY pos <= $EvalK),
       |bl AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY dl DESC, doc_id) AS pos
       |  FROM dl QUALIFY pos <= $EvalK),
       |m AS (
       |  SELECT 'bm25' AS ranker,
       |         CAST(count(rel.doc_id) AS BIGINT) AS hits,
       |         CAST(coalesce(min(pos) FILTER (rel.doc_id IS NOT NULL), 0) AS BIGINT)
       |           AS fh
       |  FROM bm LEFT JOIN rel USING (doc_id)
       |  UNION ALL
       |  SELECT 'len_desc', CAST(count(rel.doc_id) AS BIGINT),
       |         CAST(coalesce(min(pos) FILTER (rel.doc_id IS NOT NULL), 0) AS BIGINT)
       |  FROM bl LEFT JOIN rel USING (doc_id))
       |SELECT ranker, metric, value_ppm FROM (
       |  SELECT ranker, 'p_at_10' AS metric,
       |         CAST(1000000 * hits // $EvalK AS BIGINT) AS value_ppm FROM m
       |  UNION ALL
       |  SELECT ranker, 'recall_at_10',
       |         CAST(1000000 * hits // (SELECT r FROM nrel) AS BIGINT) FROM m
       |  UNION ALL
       |  SELECT ranker, 'mrr_at_10',
       |         CAST(CASE WHEN fh = 0 THEN 0 ELSE 1000000 // fh END AS BIGINT) FROM m)
       |ORDER BY ranker, metric""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val relevant = docs
      .filter(array_contains(filter(split(col("text"), " "), x => x =!= ""),
        "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet // bounded: rare term
    val bm = bm25TopK(s, dir, EvalTerms, EvalK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val bl = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("dl"))
      .orderBy(col("dl").desc, col("doc_id").asc).limit(EvalK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val out = Seq("bm25" -> bm, "len_desc" -> bl).flatMap { case (name, ranked) =>
      val (p, r, mrr) = irMetrics(ranked, relevant, EvalK)
      Seq((name, "mrr_at_10", mrr), (name, "p_at_10", p),
        (name, "recall_at_10", r))
    }
    out.toDF("ranker", "metric", "value_ppm").orderBy("ranker", "metric")
  }

  val all: Seq[Q] = Seq(q215, q216)
}
