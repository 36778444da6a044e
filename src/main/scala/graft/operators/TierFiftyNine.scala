package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 59 (round 11, eighth wave): the small-persistent-shift detector
  * and the skew diagnostic behind the repo's own salting decisions.
  *
  *  - q201: CUSUM CONTROL CHART (Page 1954) — per event type over the
  *    q149 daily grid, the two one-sided exact-integer cumulative sums
  *    `S⁺ ← max(0, S⁺ + x − μ − k)`, `S⁻ ← max(0, S⁻ + μ − k − x)`
  *    with slack k = μ/20 and alarm threshold h = μ/3 (flags when
  *    either side exceeds h). Phase-I/phase-II convention: μ is the
  *    FROZEN per-type floor-mean of the grid (the s37 frozen-stats
  *    shape) — CUSUM accumulates small persistent shifts the q197 EWMA
  *    band and the q149 single-day z² both miss. Same scale shape as
  *    q197: the max(0, ·) recurrence is genuinely sequential, so a
  *    per-type mapPartitions over the calendar-bounded grid, O(1)
  *    state; both alarm states live on the fixture (4 alarms / 150
  *    rows at h = μ/3, probed).
  *  - q202: KEY-SKEW REPORT — the diagnostic behind `Skew.salted*`:
  *    for a keyed frame, ONE row of shuffle-planning facts — key count,
  *    row count, max/mean per-key mass, max-to-mean ratio, top-1 /
  *    top-10 key shares (ppm) and the exact p99 per-key count. All
  *    partial+final: per-key counts, one 3-scalar agg, a top-10
  *    `TakeOrderedAndProject` (never a global sort), and the p99 by
  *    count-of-counts + `Cumulative.runningSum` (never a per-key
  *    window). `Skew.report` is the library face — point it at any
  *    join/agg key before deciding to salt.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFiftyNine {

  /** CUSUM slack divisor: k = μ / 20 (5 % of level). */
  private[graft] val SlackDiv = 20L
  /** CUSUM alarm divisor: h = μ / 3 (probed: both states live). */
  private[graft] val AlarmDiv = 3L

  /** THE chart step — one definition for batch q201 and any live twin.
    * `(prevSp, prevSn, mu, cnt)` → `(sp, sn)`. */
  private[graft] def cusumStep(prevSp: Long, prevSn: Long, mu: Long, cnt: Long)
      : (Long, Long) = {
    val k = mu / SlackDiv
    (math.max(0L, prevSp + cnt - mu - k), math.max(0L, prevSn + mu - k - cnt))
  }

  val q201 = Q("q201_cusum_chart",
    s"""WITH RECURSIVE dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY epoch_us(ts) // 86400000000) AS rn
       |  FROM events GROUP BY 1, 2),
       |st AS (
       |  SELECT event_type, CAST(sum(cnt) // count(*) AS BIGINT) AS mu
       |  FROM dc GROUP BY 1),
       |rec AS (
       |  SELECT dc.event_type, rn, day_idx, cnt,
       |         greatest(0, cnt - st.mu - st.mu // $SlackDiv) AS sp,
       |         greatest(0, st.mu - st.mu // $SlackDiv - cnt) AS sn
       |  FROM dc JOIN st USING (event_type) WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn, d2.day_idx, d2.cnt,
       |         greatest(0, r.sp + d2.cnt - s2.mu - s2.mu // $SlackDiv),
       |         greatest(0, r.sn + s2.mu - s2.mu // $SlackDiv - d2.cnt)
       |  FROM rec r JOIN dc d2
       |    ON d2.event_type = r.event_type AND d2.rn = r.rn + 1
       |  JOIN st s2 ON s2.event_type = d2.event_type)
       |SELECT rec.event_type, day_idx, cnt,
       |       CAST(sp AS BIGINT) AS sp, CAST(sn AS BIGINT) AS sn,
       |       CAST(CASE WHEN sp > st.mu // $AlarmDiv OR sn > st.mu // $AlarmDiv
       |            THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM rec JOIN st ON st.event_type = rec.event_type
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    cusumChart(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
      .orderBy("event_type", "day_idx")
  }

  /** The sequential CUSUM fold over a (event_type, day_idx, cnt) grid
    * with frozen per-type μ: one partition per type, sorted days, two
    * longs of carried state. */
  private[graft] def cusumChart(dc: DataFrame): DataFrame = {
    val s = dc.sparkSession
    import s.implicits._
    val mu = dc.groupBy(col("event_type").as("et"))
      .agg(expr("CAST(sum(cnt) div count(*) AS BIGINT)").as("mu"))
    dc.join(broadcast(mu), col("event_type") === col("et"))
      .select(col("event_type").cast("string"), col("day_idx").cast("long"),
        col("cnt").cast("long"), col("mu").cast("long"))
      .as[(String, Long, Long, Long)]
      .repartition(col("event_type"))
      .sortWithinPartitions("event_type", "day_idx")
      .mapPartitions { it =>
        var curType: String = null
        var sp = 0L; var sn = 0L
        it.map { case (t, d, c, mu0) =>
          if (t != curType) { sp = 0L; sn = 0L; curType = t }
          val (sp1, sn1) = cusumStep(sp, sn, mu0, c)
          sp = sp1; sn = sn1
          val h = mu0 / AlarmDiv
          (t, d, c, sp1, sn1, if (sp1 > h || sn1 > h) 1L else 0L)
        }
      }
      .toDF("event_type", "day_idx", "cnt", "sp", "sn", "alarm")
  }

  val q202 = Q("q202_key_skew_report",
    s"""WITH k AS (
       |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nk, CAST(sum(cnt) AS BIGINT) AS tot,
       |         CAST(max(cnt) AS BIGINT) AS mx
       |  FROM k),
       |t10 AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS s10
       |  FROM (SELECT cnt FROM k ORDER BY cnt DESC, key LIMIT 10)),
       |cc AS (SELECT cnt, CAST(count(*) AS BIGINT) AS freq FROM k GROUP BY 1),
       |rk AS (SELECT cnt, sum(freq) OVER (ORDER BY cnt) AS cum FROM cc),
       |p99 AS (
       |  SELECT CAST(min(cnt) AS BIGINT) AS p
       |  FROM rk, st WHERE cum >= (99 * nk + 99) // 100)
       |SELECT nk AS n_keys, tot AS total_rows, mx AS max_cnt,
       |       CAST(tot // nk AS BIGINT) AS mean_cnt,
       |       CAST(CAST(mx AS HUGEINT) * 1000000 * nk // tot AS BIGINT) AS max_mean_ppm,
       |       CAST(CAST(mx AS HUGEINT) * 1000000 // tot AS BIGINT) AS top1_ppm,
       |       CAST(CAST(s10 AS HUGEINT) * 1000000 // tot AS BIGINT) AS top10_ppm,
       |       p AS p99_cnt
       |FROM st, t10, p99""".stripMargin) { (s, dir) =>
    Skew.report(Tables.load(s, dir, "events"), col("user_id"))
  }

  val all: Seq[Q] = Seq(q201, q202)
}
