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
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("w"))
    val step = math.max(
      d.agg(sum("w")).collect()(0).getLong(0) / SlotCount, 1L) // 1-row scalar
    Cumulative.runningSum(s, d, Seq(col("doc_id")), col("w"), "cum")
      .select(col("doc_id"), col("w"),
        expr(s"cum div $step - (cum - w) div $step").as("mult"))
      .filter(col("mult") > 0)
      .orderBy("doc_id")
  }

  /** The naive easy-first order's per-lang runs — shared with the spec
    * and the s44 streaming twin's parity check. */
  private[graft] def naiveRuns(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val d = docs.select(col("doc_id"), col("lang"),
      size(filter(split(col("text"), " "), x => x =!= ""))
        .cast("long").as("difficulty"))
    val pos = Cumulative.rowNumber(s, d,
      Seq(col("difficulty"), col("doc_id")), "pos")
    val grp = pos.withColumn("rk",
        row_number().over(Window.partitionBy("lang").orderBy("pos")).cast("long"))
      .select(col("lang"), col("pos"), (col("pos") - col("rk")).as("grp"))
    grp.groupBy("lang", "grp").agg(count(lit(1)).as("len"))
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
      |SELECT lang, CAST(sum(len) AS BIGINT) AS n_docs,
      |       CAST(count(*) AS BIGINT) AS n_runs, max(len) AS max_run,
      |       CAST(((sum(len) - count(*)) * 1000000) // sum(len) AS BIGINT)
      |         AS clump_ppm
      |FROM runs GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    naiveRuns(Tables.load(s, dir, "documents"))
      .groupBy("lang")
      .agg(sum("len").as("n_docs"), count(lit(1)).as("n_runs"),
        max("len").as("max_run"))
      .select(col("lang"), col("n_docs"), col("n_runs"), col("max_run"),
        expr("((n_docs - n_runs) * 1000000) div n_docs").as("clump_ppm"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(q233, q234)
}
