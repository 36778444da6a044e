package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 74 (round 11, twenty-third wave): the weighting-quality
  * diagnostic the sampling family (q64/q71/q91/q126/q189) reports
  * nothing about — how much of the nominal sample size survives the
  * weights.
  *
  *  - q229: EFFECTIVE SAMPLE SIZE — Kish's ESS = (Σw)²/Σw² for the
  *    token-count weighting the corpus samplers draw by: ESS/n in ppm
  *    tells you how many "equivalent uniform draws" an importance-
  *    weighted scheme really yields (uniform weights → 10⁶; one whale
  *    → collapses toward 1/n). Reported per SOURCE plus the corpus
  *    row — the per-stratum table a mixing/temperature decision
  *    (q71/q91) should consult before committing rates. All exact:
  *    two Int64 sums per group (Σw ≤ corpus tokens, Σw² ≤ 10¹⁸ at
  *    10⁹-token docs — the q169 DECIMAL escape applies beyond), BigInt
  *    driver closure for the ppm rational (bounded by #sources + 1
  *    rows, q198 convention).
  *
  * Scale: one partial+final two-sum agg per group; nothing global.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star sampling ops.
  */
object TierSeventyFour {

  /** Kish ESS ppm over any (group, w) frame: per group
    * (group, n_docs, sum_w, ess_ppm_of_n) with ess_ppm_of_n =
    * 10⁶·(Σw)² div (n·Σw²) — BigInt closure, bounded by group count. */
  private[graft] def essReport(grouped: DataFrame): DataFrame = {
    val s = grouped.sparkSession
    import s.implicits._
    grouped.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"),
        sum(col("w") * col("w")).as("sww"))
      .collect().map { r =>
        val (n, sw, sww) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)),
          BigInt(r.getLong(3)))
        (r.getString(0), n.toLong, sw.toLong,
          (BigInt(1000000) * sw * sw / (n * sww)).toLong)
      }.toSeq.sortBy(_._1)
      .toDF("source", "n_docs", "sum_w", "ess_ppm_of_n")
  }

  val q229 = Q("q229_effective_sample_size",
    """WITH dw AS (
      |  SELECT source AS grp,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |              AS BIGINT) AS w
      |  FROM documents
      |  UNION ALL
      |  SELECT '(all)' AS grp,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |              AS BIGINT) AS w
      |  FROM documents),
      |sc AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
      |              CAST(sum(w) AS HUGEINT) AS sw,
      |              CAST(sum(w * w) AS HUGEINT) AS sww
      |       FROM dw GROUP BY 1)
      |SELECT grp AS source, CAST(n AS BIGINT) AS n_docs,
      |       CAST(sw AS BIGINT) AS sum_w,
      |       CAST(1000000 * sw * sw // (n * sww) AS BIGINT) AS ess_ppm_of_n
      |FROM sc ORDER BY source""".stripMargin) { (s, dir) =>
    val dw = Tables.load(s, dir, "documents")
      .select(col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("w"))
    essReport(dw.select(col("source").as("grp"), col("w"))
      .union(dw.select(lit("(all)").as("grp"), col("w"))))
  }

  val all: Seq[Q] = Seq(q229)
}
