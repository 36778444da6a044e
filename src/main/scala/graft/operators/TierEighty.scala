package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 80 (round 12, twenty-seventh wave): pseudo-relevance feedback
  * and the erasure-request audit.
  *
  *  - q239: PRF QUERY EXPANSION (Rocchio 1971's feedback idea in its
  *    modern RM-ish form) — the retrieval loop's second turn: take the
  *    BM25 top-[[FbK]] for the eval terms (the FEEDBACK set), score
  *    every other term by its feedback-vs-corpus document-frequency
  *    LIFT `(df_fb·N·10⁶) div (df_corpus·|fb|)` (the q131 integer-lift
  *    surrogate — ranking-equivalent to the probability ratio), and
  *    emit the top-[[ExpandK]] expansion candidates. Everything is
  *    df-keyed partial+final; the feedback set rides a broadcast
  *    ≤ FbK-row frame.
  *  - q240: ERASURE AUDIT (the GDPR "right to be forgotten" gap) —
  *    deleting a document's ROW does not delete its CONTENT if a
  *    paraphrase survives: for a deterministic erasure list
  *    (doc_id ≡ 0 mod [[EraseMod]]), report every deleted doc whose
  *    SEMANTIC TWIN (celled near-dup, cos ≥ 0.9 — the q121-family
  *    production detector) survives the deletion. Exact copies are a
  *    subset (this corpus ships none — probed; the near-dup detector is
  *    precisely what still fires). The compliance sibling of q124:
  *    contamination asks "did eval leak into train", erasure asks "did
  *    the deleted content leak into the survivors".
  *
  * Scale: q239 is two df aggregations + one broadcast semi-join; q240
  * is the celled pair source (cell-keyed, never all-pairs) + a
  * doc_id-mod projection — no extra shuffle beyond the pair join.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star retrieval /
  * compliance ops.
  */
object TierEighty {

  private[graft] val FbK = 10
  private[graft] val ExpandK = 5
  private[graft] val EraseMod = 11L
  private val Thr = 0.9

  val q239 = Q("q239_prf_expansion",
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
       |fb AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |           row_number() OVER (ORDER BY score DESC, doc_id) AS pos
       |    FROM (
       |      SELECT doc_id,
       |             sum((tf * 2200 * ((n * 1000000) // df)) //
       |                 (tf * 1000 +
       |                  (1200 * (250 + (750 * ((dl * 1000) // (total_toks // n))) // 1000)) // 1000))
       |               AS score
       |      FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN tot
       |      GROUP BY 1))
       |  WHERE pos <= $FbK),
       |dt AS (SELECT DISTINCT doc_id, token FROM toks),
       |dffb AS (SELECT token, CAST(count(*) AS BIGINT) AS df_fb
       |         FROM dt JOIN fb USING (doc_id) GROUP BY 1),
       |dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df_corpus
       |        FROM dt GROUP BY 1),
       |nfb AS (SELECT CAST(count(*) AS BIGINT) AS nf FROM fb)
       |SELECT token, df_fb, df_corpus,
       |       CAST((df_fb * tot.n * 1000000) // (df_corpus * nfb.nf) AS BIGINT)
       |         AS lift_ppm
       |FROM dffb JOIN dfc USING (token) CROSS JOIN nfb CROSS JOIN tot
       |WHERE token NOT IN (SELECT token FROM q)
       |ORDER BY lift_ppm DESC, token LIMIT $ExpandK""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val terms = TierSixtySix.EvalTerms
    // the feedback set is the BM25 top-k's ids — a ≤ FbK broadcast frame
    val fb = TierSixtySix.bm25TopK(s, dir, terms, FbK).select("doc_id")
    val dt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").distinct()
    val dffb = dt.join(broadcast(fb), "doc_id")
      .groupBy("token").agg(count(lit(1)).as("df_fb"))
    val dfc = dt.groupBy("token").agg(count(lit(1)).as("df_corpus"))
    val n = docs.agg(count(lit(1)).as("n"))
    val nf = fb.agg(count(lit(1)).as("nf"))
    dffb.join(dfc, "token")
      .filter(!col("token").isin(terms: _*))
      .crossJoin(broadcast(n)).crossJoin(broadcast(nf))
      .select(col("token"), col("df_fb"), col("df_corpus"),
        expr("(df_fb * n * 1000000) div (df_corpus * nf)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("token").asc)
      .limit(ExpandK)
  }

  val q240 = Q("q240_erasure_audit",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(Thr)}
       |SELECT CASE WHEN doc_a % $EraseMod = 0 THEN doc_a ELSE doc_b END AS deleted_doc,
       |       CASE WHEN doc_a % $EraseMod = 0 THEN doc_b ELSE doc_a END AS surviving_twin,
       |       round(c, 6) AS cos
       |FROM hits
       |WHERE (doc_a % $EraseMod = 0) <> (doc_b % $EraseMod = 0)
       |ORDER BY deleted_doc, surviving_twin""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    erasureAuditOver(TierNineteen.celledEmbedPairsOf(docs, Thr))
  }

  /** q240's survivor scan over an ARBITRARY pair frame `(doc_a, doc_b,
    * c)` — the extracted face the shared-build bench sweep drives with
    * [[TierNineteen.CelledArtifacts.pairs]](Thr) (BenchFacesSpec pins
    * face ≡ declared query). */
  private[graft] def erasureAuditOver(hits: DataFrame): DataFrame = {
    val delA = col("doc_a") % EraseMod === 0
    val delB = col("doc_b") % EraseMod === 0
    hits
      .filter(delA =!= delB)
      .select(
        when(delA, col("doc_a")).otherwise(col("doc_b")).as("deleted_doc"),
        when(delA, col("doc_b")).otherwise(col("doc_a")).as("surviving_twin"),
        round(col("c"), 6).as("cos"))
      .orderBy("deleted_doc", "surviving_twin")
  }

  private[graft] def q240Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    erasureAuditOver(art.pairs(Thr))

  val all: Seq[Q] = Seq(q239, q240)
}
