package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 105 (round 15): the rank test for repeated measures and the
  * vocabulary-growth curve.
  *
  *  - q289: FRIEDMAN TEST (Friedman 1937) — do the event types differ
  *    systematically in daily volume, judged WITHIN each day? Blocks
  *    are calendar days, treatments the k event types, the response
  *    each type's daily count; ranks are computed within a block
  *    (average ranks on ties via the q259 2×-rank integerization:
  *    `2·r̄ = 2·|less| + |equal incl. self| + 1`), and the
  *    tie-uncorrected statistic is evaluated EXACTLY in Int64:
  *    `χ²_F = (3·Σ R2_j² − 3·n²·k·(k+1)²) / (n·k·(k+1))`, milli-floored
  *    as one integer division (never a float subtraction of two big
  *    terms). Only COMPLETE blocks (all k types present) participate —
  *    the standard design requirement, declared. The within-block
  *    sibling of q194's Mann–Whitney (two groups, no blocking) and
  *    q251's Mann–Kendall (one series).
  *  - q290: VOCABULARY GROWTH CURVE (Heaps' law readout) — new distinct
  *    word BIGRAMS per doc_id decile and the cumulative curve: each
  *    bigram is charged to the decile of its FIRST appearance (min
  *    doc_id), so the curve is exactly "types seen after p% of the
  *    corpus". Bigrams, not unigrams: the synthetic corpus' unigram
  *    vocabulary saturates inside the first decile (1-row curve — a
  *    vacuous fixture), while the bigram space keeps growing — the same
  *    reason Heaps exponents are reported on n-grams. The empirical
  *    face of q282's Chao1: Chao1 extrapolates the asymptote, this
  *    measures the approach to it. All-integer.
  *
  * Scale: q289's rank join is k² per block (k = |event types|, a
  * grouping dimension) after one (day, type) aggregation; q290 is two
  * hash aggregations (token → min doc, decile → count) and a 10-row
  * broadcast triangle join for the cumulative sum.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation / corpus-analysis ops.
  */
object TierHundredFive {

  /** Friedman over ANY `(blk, trt, v)` complete-block frame: one row
    * `(n_blocks, k_treatments, sum_r2_sq, stat_milli)`. Callers must
    * pass complete blocks (every treatment once per block). */
  private[graft] def friedmanOver(btv: DataFrame): DataFrame = {
    val a = btv.select(col("blk"), col("trt"), col("v"))
    val b = btv.select(col("blk"), col("trt").as("trt_b"), col("v").as("v_b"))
    // 2×average-rank of treatment within its block (ties averaged)
    val r2 = a.join(b, Seq("blk"))
      .groupBy(col("blk"), col("trt"))
      .agg((sum(when(col("v_b") < col("v"), 2L).otherwise(0L))
        + sum(when(col("v_b") === col("v"), 1L).otherwise(0L)) + 1L).as("r2"))
    val rj = r2.groupBy("trt").agg(sum("r2").as("r2j"), count(lit(1)).as("n"))
    rj.agg(max(col("n")).as("n_blocks"), count(lit(1)).as("k"),
        sum(col("r2j") * col("r2j")).as("s"))
      .select(col("n_blocks"), col("k").as("k_treatments"),
        col("s").as("sum_r2_sq"),
        expr(
          """CAST(CASE WHEN n_blocks = 0 OR k < 2 THEN -1
            |     ELSE (1000 * (3 * s - 3 * n_blocks * n_blocks * k * (k + 1) * (k + 1)))
            |          DIV (n_blocks * k * (k + 1))
            |END AS BIGINT)""".stripMargin).as("stat_milli"))
  }

  val q289 = Q("q289_friedman",
    """WITH dt AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS blk, event_type AS trt,
      |         CAST(count(*) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |k AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM dt),
      |complete AS (
      |  SELECT blk FROM dt GROUP BY blk
      |  HAVING count(*) = (SELECT k FROM k)),
      |cb AS (SELECT dt.* FROM dt JOIN complete USING (blk)),
      |r2 AS (
      |  SELECT a.blk, a.trt,
      |         CAST(sum(CASE WHEN b.v < a.v THEN 2 ELSE 0 END)
      |            + sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r2
      |  FROM cb a JOIN cb b ON a.blk = b.blk GROUP BY 1, 2),
      |rj AS (SELECT trt, CAST(sum(r2) AS BIGINT) AS r2j,
      |              CAST(count(*) AS BIGINT) AS n
      |       FROM r2 GROUP BY 1),
      |m AS (SELECT CAST(max(n) AS BIGINT) AS n_blocks,
      |             CAST(count(*) AS BIGINT) AS k,
      |             CAST(sum(r2j * r2j) AS BIGINT) AS s
      |      FROM rj)
      |SELECT n_blocks, k AS k_treatments, s AS sum_r2_sq,
      |       CAST(CASE WHEN n_blocks = 0 OR k < 2 THEN -1
      |            ELSE (1000 * (3 * s - 3 * n_blocks * n_blocks * k * (k + 1) * (k + 1)))
      |                 // (n_blocks * k * (k + 1))
      |       END AS BIGINT) AS stat_milli
      |FROM m""".stripMargin) { (s, dir) =>
    val dt = Tables.load(s, dir, "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("blk"),
        col("event_type").as("trt"))
      .agg(count(lit(1)).as("v"))
    val k = dt.select(countDistinct(col("trt")).as("k"))
    val complete = dt.groupBy("blk").agg(count(lit(1)).as("c"))
      .join(broadcast(k), col("c") === col("k")).select("blk")
    friedmanOver(dt.join(complete, Seq("blk")))
  }

  /** Growth curve over ANY `(doc_id, token)` occurrence frame and a
    * doc-id span: `(decile, new_types, cum_types)`, 10 rows max. */
  private[graft] def growthOver(tok: DataFrame): DataFrame = {
    val span = tok.agg(max(col("doc_id")).as("mx"))
    val firsts = tok.groupBy("token").agg(min(col("doc_id")).as("first_doc"))
    val byDecile = firsts.crossJoin(broadcast(span))
      .select(expr("(first_doc * 10) div (mx + 1)").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_types"))
    val other = byDecile.select(col("decile").as("d2"),
      col("new_types").as("nt2"))
    byDecile.join(broadcast(other), col("d2") <= col("decile"))
      .groupBy(col("decile"), col("new_types"))
      .agg(sum(col("nt2")).as("cum_types"))
      .select("decile", "new_types", "cum_types")
      .orderBy("decile")
  }

  val q290 = Q("q290_vocab_growth",
    """WITH arr AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |  FROM documents),
      |t AS (
      |  SELECT DISTINCT doc_id, shingle AS token FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(l) - 1),
      |      k -> l[k+1] || ' ' || l[k+2])) AS shingle FROM arr)),
      |mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mx FROM t),
      |f AS (SELECT token, CAST(min(doc_id) AS BIGINT) AS first_doc
      |      FROM t GROUP BY 1),
      |d AS (
      |  SELECT CAST((first_doc * 10) // (mx + 1) AS BIGINT) AS decile,
      |         CAST(count(*) AS BIGINT) AS new_types
      |  FROM f CROSS JOIN mx GROUP BY 1)
      |SELECT a.decile, a.new_types, CAST(sum(b.new_types) AS BIGINT) AS cum_types
      |FROM d a JOIN d b ON b.decile <= a.decile
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
    growthOver(TierHundredTwo.bigramsOf(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("shingle").as("token")))
  }

  val all: Seq[Q] = Seq(q289, q290)
}
