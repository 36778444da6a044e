package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 34 (round 10, sixth wave): CURRICULUM ORDERING — the
  * deterministic training-order closers between corpus prep (what's in)
  * and packing (how it's shaped): in WHAT ORDER the trainer sees it.
  *
  *  - q152: CURRICULUM INTERLEAVE — docs ordered easy-first (whitespace
  *    token count, the q32 `ws_tokens` convention) but STRATIFIED
  *    round-robin across sources: position is (per-source difficulty
  *    rank, source, doc_id) — every source contributes its k-th-easiest
  *    doc before any source contributes its (k+1)-th, so no source
  *    floods any curriculum window (the mixing discipline q71 applies
  *    to rates, applied to ORDER).
  *  - q153: the BATCH SCHEDULE — q152's order cut into fixed
  *    [[BatchSize]]-doc micro-batches with per-batch difficulty and
  *    source-diversity stats: the manifest a trainer consumes and the
  *    curriculum-QA report ("is difficulty actually monotone-ish? is
  *    every batch source-diverse?") reads.
  *
  * Scale: the per-source rank is a KEYED window (partitions by source —
  * the q138 per-user discipline, never partitionless); the global
  * position is [[Cumulative.rowNumber]]'s two-pass distributed rank, ≤
  * #partitions longs to the driver. q153 adds one batch-keyed
  * partial+final agg on top.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star pipeline ops.
  */
object TierThirtyFour {

  private val BatchSize = 32

  private[operators] def ordered(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
          .as("difficulty"))
    val r = d.withColumn("rk",
      row_number().over(Window.partitionBy("source")
        .orderBy(col("difficulty"), col("doc_id"))).cast("long"))
    Cumulative.rowNumber(s, r,
        Seq(col("rk"), col("source"), col("doc_id")), "pos")
      .select(col("pos"), col("doc_id"), col("source"), col("difficulty"))
  }

  val q152 = Q("q152_curriculum_order",
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
      |           AS difficulty
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, difficulty,
      |         CAST(row_number() OVER (PARTITION BY source
      |                                 ORDER BY difficulty, doc_id) AS BIGINT) AS rk
      |  FROM d)
      |SELECT CAST(row_number() OVER (ORDER BY rk, source, doc_id) AS BIGINT) AS pos,
      |       doc_id, source, difficulty
      |FROM r ORDER BY pos""".stripMargin) { (s, dir) =>
    ordered(s, dir).orderBy("pos")
  }

  /** Per-batch manifest: size, distinct sources, summed difficulty. */
  val q153 = Q("q153_batch_schedule",
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |           AS difficulty
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, difficulty,
       |         CAST(row_number() OVER (PARTITION BY source
       |                                 ORDER BY difficulty, doc_id) AS BIGINT) AS rk
       |  FROM d),
       |p AS (
       |  SELECT CAST(row_number() OVER (ORDER BY rk, source, doc_id) AS BIGINT) AS pos,
       |         source, difficulty
       |  FROM r)
       |SELECT (pos - 1) // $BatchSize AS batch_idx,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |       CAST(sum(difficulty) AS BIGINT) AS difficulty_sum
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    ordered(s, dir)
      .groupBy(expr(s"(pos - 1) div $BatchSize").as("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        sum("difficulty").as("difficulty_sum"))
      .orderBy("batch_idx")
  }

  val all: Seq[Q] = Seq(q152, q153)
}
