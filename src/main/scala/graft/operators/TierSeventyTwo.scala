package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 72 (round 11, twenty-first wave): uplift heterogeneity — the
  * readout slice every pooled statistic in the q166/q194–q200 family
  * flattens.
  *
  *  - q226: UPLIFT BY SEGMENT (heterogeneous treatment effects) — the
  *    A/B conversion readout PER pre-period-activity tercile: users
  *    segmented by their event count in the first 15 observed days
  *    (the q198 pre/post split — segmenting on PRE-period behavior
  *    keeps the slice independent of treatment), outcome = the q166
  *    high-value conversion restricted to the POST period, and per
  *    segment the per-arm counts, exact-ppm rates, the rate diff and
  *    the all-integer χ² significance bit through the SHARED
  *    [[TierFortyOne.chi2Significant]] BigInt cross-multiplication.
  *    "The lift is +X pooled" hides segments where it is zero or
  *    negative — this is the table that shows them.
  *
  * Scale: one pre-period keyed count, one `Cumulative.rowNumber`
  * two-pass tercile rank (never a global window), one distinct
  * conversion set, one 6-cell fold; the χ² closure runs driver-side
  * over 3 bounded segment rows (q198 convention).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star
  * experimentation ops.
  */
object TierSeventyTwo {

  import TierFour.{A0, B0, P}

  private val SplitDays = 15L

  val q226 = Q("q226_uplift_by_segment",
    s"""WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS m FROM events),
       |pre AS (
       |  SELECT user_id,
       |         CAST(count(*) FILTER (epoch_us(ts) // 86400000000 < m + $SplitDays)
       |              AS BIGINT) AS pn
       |  FROM events CROSS JOIN d0 GROUP BY 1),
       |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pre),
       |seg AS (
       |  SELECT user_id,
       |         (row_number() OVER (ORDER BY pn, user_id) - 1) * 3 // n1.n AS s
       |  FROM pre, n1),
       |conv AS (
       |  SELECT DISTINCT user_id FROM events CROSS JOIN d0
       |  WHERE event_type = 'purchase'
       |    AND floor(value * 100) >= ${TierFortyOne.HiCents}
       |    AND epoch_us(ts) // 86400000000 >= m + $SplitDays),
       |cells AS (
       |  SELECT seg.s,
       |         ((seg.user_id % $P) * $A0 + $B0) % $P % 2 AS arm,
       |         CAST(count(*) AS HUGEINT) AS n,
       |         CAST(count(conv.user_id) AS HUGEINT) AS cv
       |  FROM seg LEFT JOIN conv USING (user_id) GROUP BY 1, 2),
       |g AS (
       |  SELECT s,
       |         max(CASE WHEN arm = 0 THEN n END) AS na,
       |         max(CASE WHEN arm = 1 THEN n END) AS nb,
       |         max(CASE WHEN arm = 0 THEN cv END) AS ca,
       |         max(CASE WHEN arm = 1 THEN cv END) AS cb
       |  FROM cells GROUP BY 1)
       |SELECT CAST(s AS BIGINT) AS segment,
       |       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |       CAST(ca AS BIGINT) AS conv_a, CAST(cb AS BIGINT) AS conv_b,
       |       CAST(1000000 * cb // nb - 1000000 * ca // na AS BIGINT)
       |         AS diff_ppm,
       |       CAST(CASE WHEN 100 * (na + nb)
       |                      * (ca * (nb - cb) - cb * (na - ca))
       |                      * (ca * (nb - cb) - cb * (na - ca))
       |                 > 384 * (ca + cb) * (na - ca + nb - cb) * na * nb
       |                 THEN 1 ELSE 0 END AS BIGINT) AS sig
       |FROM g ORDER BY segment""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val dayIdx = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    val m = ev.agg(min(dayIdx)).collect()(0).getLong(0) // bounded 1-row scalar
    val split = m + SplitDays
    val pre = ev.groupBy("user_id")
      .agg(sum(when(dayIdx < split, 1L).otherwise(0L)).as("pn"))
    val n = pre.count() // user cardinality — bounded scalar
    val seg = Cumulative.rowNumber(s, pre.select(col("user_id"), col("pn")),
        Seq(col("pn"), col("user_id")), "rn")
      .select(col("user_id"), expr(s"(rn - 1) * 3 div ${n}L").as("s"))
    val conv = ev.filter(col("event_type") === "purchase" &&
        floor(col("value") * 100) >= TierFortyOne.HiCents && dayIdx >= split)
      .select(col("user_id").as("cu")).distinct()
    val cells = seg.join(conv, col("cu") === col("user_id"), "left")
      .withColumn("arm", expr(s"((user_id % $P) * $A0 + $B0) % $P % 2"))
      .groupBy("s", "arm")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cu").isNotNull, 1L).otherwise(0L)).as("cv"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap // bounded: 3 segments × 2 arms
    val rows = cells.keys.map(_._1).toSeq.distinct.sorted.map { sg =>
      val (na, ca) = cells((sg, 0L)); val (nb, cb) = cells((sg, 1L))
      (sg, na, nb, ca, cb,
        1000000L * cb / nb - 1000000L * ca / na,
        TierFortyOne.chi2Significant(ca, na - ca, cb, nb - cb))
    }
    rows.toDF("segment", "n_a", "n_b", "conv_a", "conv_b", "diff_ppm", "sig")
      .orderBy("segment")
  }

  val all: Seq[Q] = Seq(q226)
}
