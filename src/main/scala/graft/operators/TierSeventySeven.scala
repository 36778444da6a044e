package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 77 (round 12, twenty-fifth wave): training-order construction
  * and its audit — how an epoch's sample is DRAWN and whether its
  * ORDER is safe to train on.
  *
  *  - q233: SYSTEMATIC WEIGHTED RESAMPLE (Madow 1949; the PPS epoch
  *    oversample) — [[SlotCount]] training slots drawn from the corpus
  *    with probability ∝ token weight, deterministically: one token
  *    prefix sum in doc_id order (the [[Cumulative.runningSum]]
  *    two-pass), a fixed stride `step = Σw div slots`, and each doc
  *    receives `mult = cum div step − (cum − w) div step` slots — the
  *    integer boundary-crossing count, zero randomness, reproducible
  *    under retry. A doc longer than the stride legitimately draws
  *    MULTIPLE slots (oversampling with replacement — the fixture
  *    exercises mult ≥ 2); short docs between boundaries draw none.
  *  - q234: INTERLEAVE AUDIT (run-length clumping) — the diagnostic
  *    that justifies q152's per-source interleave: under the NAIVE
  *    easy-first order (difficulty, doc_id — no interleave), same-lang
  *    documents CLUMP into consecutive runs (gradient batches go
  *    monolingual — the correlated-batch failure). Gaps-and-islands
  *    per lang over the naive order → per-lang (n_docs, n_runs,
  *    max_run, clump_ppm = 10⁶·(n_docs − n_runs) // n_docs); q152's
  *    interleaved order scores clump_ppm = 0 on this fixture (every
  *    run length 1 — the spec pins the contrast), the naive order
  *    does not.
  *
  * Scale: q233 is the two-pass distributed prefix sum plus one
  * 1-row driver scalar (Σw — the q109 bounded-read convention);
  * q234's global position is the same two-pass rank, and the per-lang
  * island rank is a per-key window (the q152 plan shape; lang
  * cardinality is the partition count). The STREAMING twin is s44
  * ([[graft.streaming.RunMonitor]]): O(1) state — current run only —
  * for the same audit over a live feed, where no window is needed at
  * any scale.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star pipeline ops.
  */
object TierSeventySeven {

  private[graft] val SlotCount = 1024L

  val q233 = Q("q233_systematic_resample",
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, w,
       |         CAST(sum(w) OVER (ORDER BY doc_id
       |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM d),
       |t AS (SELECT greatest(CAST(sum(w) AS BIGINT) // $SlotCount, 1) AS step FROM d)
       |SELECT doc_id, w, cum // step - (cum - w) // step AS mult
       |FROM c CROSS JOIN t
       |WHERE cum // step - (cum - w) // step > 0
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    resampleOver(Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("w")), "doc_id", "w", SlotCount)
  }

  /** q233's stride walk over ANY `(key, weight)` frame — the extracted
    * library face (`graft_resample` SQL twin). Output
    * `(<key>, <weight>, mult)`, mult > 0 rows only, key order. */
  private[graft] def resampleOver(d: org.apache.spark.sql.DataFrame,
      key: String, w: String, slots: Long): org.apache.spark.sql.DataFrame = {
    val s = d.sparkSession
    // 1-row scalar; sum() over an EMPTY frame is NULL (reachable through
    // the public graft_resample twin) — treat it as 0 so the walk returns
    // an empty frame instead of throwing on the read
    val sumRow = d.agg(sum(w)).collect()(0)
    val total = if (sumRow.isNullAt(0)) 0L else sumRow.getLong(0)
    val step = math.max(total / slots, 1L)
    Cumulative.runningSum(s, d, Seq(col(key)), col(w), "cum")
      .select(col(key), col(w),
        expr(s"cum div $step - (cum - $w) div $step").as("mult"))
      .filter(col("mult") > 0)
      .orderBy(key)
  }

  /** The naive easy-first order as a positioned `(pos, lang)` frame —
    * q234's input and the s44 streaming twin's feed shape. */
  private[graft] def naivePositions(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val d = docs.select(col("doc_id"), col("lang"),
      size(filter(split(col("text"), " "), x => x =!= ""))
        .cast("long").as("difficulty"))
    Cumulative.rowNumber(s, d,
        Seq(col("difficulty"), col("doc_id")), "pos")
      .select(col("pos"), col("lang"))
  }

  /** q234's per-key run-length report over ANY pre-positioned
    * `(pos, key)` frame — the extracted library face (`graft_run_lengths`
    * SQL twin): gaps-and-islands per key, then
    * `(<key>, n_rows, n_runs, max_run, clump_ppm)`, key order.
    *
    * Shape bound: the island rank is a per-KEY window, so the rank
    * stage's parallelism equals the key cardinality (lang here — 5).
    * That is the right plan for a LOW-cardinality audit key (each
    * partition streams its positions once); if a future caller keys by
    * something high-skew/low-cardinality at 100× data, re-shape the rank
    * onto the value-grouped two-pass [[Cumulative]] pattern
    * (q194/q199 precedent) instead of widening this window. */
  private[graft] def runLengthsOver(d: org.apache.spark.sql.DataFrame,
      pos: String, key: String): org.apache.spark.sql.DataFrame = {
    val runs = d.withColumn("rk",
        row_number().over(Window.partitionBy(key).orderBy(pos)).cast("long"))
      .select(col(key), (col(pos) - col("rk")).as("grp"))
      .groupBy(key, "grp").agg(count(lit(1)).as("len"))
    runs.groupBy(key)
      .agg(sum("len").as("n_rows"), count(lit(1)).as("n_runs"),
        max("len").as("max_run"))
      .select(col(key), col("n_rows"), col("n_runs"), col("max_run"),
        expr("((n_rows - n_runs) * 1000000) div n_rows").as("clump_ppm"))
      .orderBy(key)
  }

  val q234 = Q("q234_interleave_audit",
    """WITH d AS (
      |  SELECT doc_id, lang,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
      |           AS difficulty
      |  FROM documents),
      |p AS (
      |  SELECT lang,
      |         CAST(row_number() OVER (ORDER BY difficulty, doc_id) AS BIGINT) AS pos
      |  FROM d),
      |g AS (
      |  SELECT lang, pos,
      |         pos - CAST(row_number() OVER (PARTITION BY lang ORDER BY pos) AS BIGINT)
      |           AS grp
      |  FROM p),
      |runs AS (SELECT lang, grp, CAST(count(*) AS BIGINT) AS len
      |         FROM g GROUP BY 1, 2)
      |SELECT lang, CAST(sum(len) AS BIGINT) AS n_rows,
      |       CAST(count(*) AS BIGINT) AS n_runs, max(len) AS max_run,
      |       CAST(((sum(len) - count(*)) * 1000000) // sum(len) AS BIGINT)
      |         AS clump_ppm
      |FROM runs GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    runLengthsOver(naivePositions(Tables.load(s, dir, "documents")),
      "pos", "lang")
  }

  val all: Seq[Q] = Seq(q233, q234)
}
