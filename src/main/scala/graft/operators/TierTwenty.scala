package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 20 (round 8, eighth wave): launch-assembly closers — the exact
  * budget cut that sizes a training mix, and the consolidated
  * contamination report read before the mix ships.
  *
  *  - q123: token-BUDGET cut — keep documents, in deterministic hash
  *    order, until an exact global token budget is spent: the "fit the
  *    mix into B tokens" step between q118's schedule and the export.
  *  - q124: cross-split CONTAMINATION report — every valid doc flagged
  *    for exact-text duplication against train AND for semantic twinning
  *    (q122's embedding pairs): the one-table pre-launch leakage audit.
  *
  * Reference mapping: none (SURVEY.md §2.1); north-star LLM-pipeline ops.
  */
object TierTwenty {

  import TierFour.{A0, B0, P}

  private val Budget = 20000L // tokens

  /** Exact global token-budget cut: docs ordered by the affine doc_id
    * hash (q48/q64's deterministic-sampling order — unbiased w.r.t.
    * content, retry-stable), inclusive running token count via
    * [[Cumulative.runningSum]]'s two-pass distributed prefix sum, keep
    * while `cum ≤ B`. The cut is EXACT — the kept set is the maximal
    * hash-order prefix inside the budget (maximality spec-pinned), not a
    * rate approximation (q48/q71's shape, which can overshoot on
    * variable-length docs).
    *
    * Scale: token counts are a narrow projection; the prefix sum is
    * range-partition + per-partition fold + broadcast offsets — no
    * global sort to one partition, no driver data movement beyond the
    * per-partition totals. The budget filter then prunes every partition
    * past the cut by its offset alone.
    */
  val q123 = Q("q123_budget_cut",
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
       |         ((doc_id % $P) * $A0 + $B0) % $P AS h
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tok,
       |         sum(n_tok) OVER (ORDER BY h, doc_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT doc_id, n_tok, CAST(cum AS BIGINT) AS cum_tok
       |FROM c WHERE cum <= $Budget ORDER BY cum_tok, doc_id""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tok"),
        (((col("doc_id") % P) * A0 + B0) % P).as("h"))
    Cumulative.runningSum(s, t, Seq(col("h"), col("doc_id")), col("n_tok"), "cum_tok")
      .filter(col("cum_tok") <= Budget)
      .select(col("doc_id"), col("n_tok"), col("cum_tok"))
      .orderBy("cum_tok", "doc_id")
  }

  /** Consolidated cross-split contamination report — one row per VALID
    * doc with both leakage flags: `exact_dup` (its text digest appears
    * in train — q78's vector) and `semantic_dup` (an embedding twin at
    * cosine ≥ 0.95 sits in train — q122's vector, which catches the
    * paraphrases exact matching cannot). The pre-launch audit table; a
    * launch gate reads `sum(exact_dup) = 0 AND sum(semantic_dup) = 0`.
    *
    * Scale: the exact side joins fixed-width digests keyed on the hash,
    * never text (Dedup.exactSurvivors' key discipline); the semantic
    * side DECLARES the celled production pair source since round 12
    * ([[TierNineteen.celledEmbedPairsOf]], matching q122's re-sourcing —
    * the flags stay mutually consistent because both read the same
    * detector); valid is ~1 % of the corpus, so both probe frames are
    * small against a broadcast or bucketed train side.
    */
  val q124 = Q("q124_contamination_report",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(0.95)},
       |sp AS (
       |  SELECT doc_id, ((doc_id % $P) * $A0 + $B0) % $P % 1000 AS bkt
       |  FROM documents),
       |st AS (
       |  SELECT doc_id, CASE WHEN bkt < 980 THEN 'train' ELSE 'valid' END AS split
       |  FROM sp WHERE bkt < 990),
       |vd AS (SELECT doc_id FROM st WHERE split = 'valid'),
       |tr AS (SELECT doc_id FROM st WHERE split = 'train'),
       |ex AS (
       |  SELECT DISTINCT v.doc_id
       |  FROM documents v JOIN vd USING (doc_id)
       |  JOIN documents t0 ON t0.text = v.text
       |  JOIN tr ON tr.doc_id = t0.doc_id),
       |se AS (
       |  SELECT DISTINCT CASE WHEN sa.split = 'valid' THEN h.doc_a ELSE h.doc_b END AS doc_id
       |  FROM hits h
       |  JOIN st sa ON sa.doc_id = h.doc_a
       |  JOIN st sb ON sb.doc_id = h.doc_b
       |  WHERE sa.split <> sb.split)
       |SELECT v.doc_id,
       |       CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_dup,
       |       CAST(CASE WHEN se.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS semantic_dup
       |FROM vd v
       |LEFT JOIN ex ON ex.doc_id = v.doc_id
       |LEFT JOIN se ON se.doc_id = v.doc_id
       |ORDER BY v.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    contaminationOver(docs, TierNineteen.celledEmbedPairsOf(docs, 0.95))
  }

  /** q124's contamination report over an ARBITRARY semantic pair frame
    * `(doc_a, doc_b, …)` — the extracted face the shared-build bench
    * sweep drives with [[TierNineteen.CelledArtifacts.pairs]](0.95)
    * (BenchFacesSpec pins face ≡ declared query bit for bit). */
  private[graft] def contaminationOver(docs: DataFrame,
      hits: DataFrame): DataFrame = {
    val bkt = ((col("doc_id") % P) * A0 + B0) % P % 1000
    val st = docs.select(col("doc_id"), bkt.as("bkt"))
      .filter(col("bkt") < 990)
      .select(col("doc_id"),
        when(col("bkt") < 980, "train").otherwise("valid").as("split"))
    val vd = st.filter(col("split") === "valid").select("doc_id")
    val digests = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val trainH = digests
      .join(st.filter(col("split") === "train").select("doc_id"), Seq("doc_id"), "left_semi")
      .select("h")
    val ex = digests.join(vd, Seq("doc_id"), "left_semi")
      .join(trainH, Seq("h"), "left_semi")
      .select(col("doc_id"), lit(1L).as("exact_dup"))
    val se = hits
      .join(st.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(st.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .select(when(col("sa") === "valid", col("doc_a")).otherwise(col("doc_b")).as("doc_id"))
      .distinct()
      .select(col("doc_id"), lit(1L).as("semantic_dup"))
    vd.join(ex, Seq("doc_id"), "left")
      .join(se, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0L)).as("exact_dup"),
        coalesce(col("semantic_dup"), lit(0L)).as("semantic_dup"))
      .orderBy("doc_id")
  }

  private[graft] def q124Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    contaminationOver(docs, art.pairs(0.95))
  }

  /** q123's STREAMING twin — a budget gate that admits documents in
    * arrival order until the global budget is spent, with q123's PREFIX
    * semantics (the first overflowing doc CLOSES the gate — later smaller
    * docs do not squeeze in; a greedy remaining-budget rule would, and
    * would diverge from the batch cut). Carries `cum` across
    * micro-batches; rows within a batch order by `(h, doc_id)` so a
    * hash-ordered feed reproduces the batch prefix exactly (s33 pins
    * stream ≡ batch q123).
    *
    * The per-batch `collect` is the batch's (doc_id, n_tok) manifest —
    * metadata-scale; admission is inherently sequential, which is the
    * point of a budget. At-least-once replay would double-count `cum`;
    * production records absorbed batch ids exactly as [[IvfStore]]'s
    * ledger does.
    */
  private[graft] final class BudgetGate(budget: Long = Budget) {
    private var cum = 0L
    private var stopped = false
    /** Admit one micro-batch of `(doc_id, n_tok, h)` rows; returns the
      * admitted doc_ids in order. */
    def admit(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val rows = df.select(col("h"), col("doc_id"), col("n_tok")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      rows.iterator.flatMap { case (_, id, n) =>
        if (stopped) None
        else {
          cum += n
          if (cum <= budget) Some(id) else { stopped = true; None }
        }
      }.toSeq
    }
  }

  val all: Seq[Q] = Seq(q123, q124)
}
