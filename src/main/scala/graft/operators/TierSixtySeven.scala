package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 67 (round 11, sixteenth wave): the data-contract profile and
  * change-point localization — the table-metadata snapshot a catalog
  * publishes, and the "WHEN did it shift" answer the control charts
  * stop short of.
  *
  *  - q217: TABLE PROFILE — the dbt/catalog per-column snapshot over
  *    `orders`: (column, n_rows, n_nulls, n_distinct) for a PINNED
  *    column list (discovery-free, the q39 pivot-values argument). The
  *    plan is one single-column scan per column unioned — each scan
  *    prunes to exactly ONE column, which at 100 TB columnar beats the
  *    one-pass Expand alternative (multiple countDistinct in one agg
  *    plans an Expand ×#cols ROW multiplication that reads every
  *    column's bytes through the whole multiplied stream). The driver
  *    tables are constraint-clean so n_nulls are HONEST ZEROS (q203's
  *    audit injects violations to prove its checks fire; the profile
  *    REPORTS, so zeros are the truthful answer — the spec proves the
  *    null counter fires on a constructed frame).
  *  - q218: ALARM ONSET — change-point localization over q201's CUSUM
  *    chart: per event type the FIRST alarm day, the side that fired
  *    ('up' when S⁺ ≥ S⁻ at that day, pinned precedence), and the
  *    standard CUSUM onset estimate — the LAST day strictly before the
  *    alarm on which the firing side's sum was 0 (the shift began
  *    right after it; Page's run-start estimator). Types that never
  *    alarm report honest NULLs (error/view on the fixture; click and
  *    signup fire up, purchase fires down — every branch live).
  *
  * Scale: q217 is #cols bounded cheap aggs; q218 adds two keyed aggs
  * and a broadcast-size join over the chart frame (#types × #days),
  * nothing beyond the chart's own cost.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star catalog /
  * monitoring ops.
  */
object TierSixtySeven {

  /** The pinned profile column list (discovery-free). */
  private[graft] val ProfileCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Per-column (column, n_rows, n_nulls, n_distinct) — the q217 body
    * over any frame, exposed for the spec's constructed-nulls proof. */
  private[graft] def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)) // one-column scan: columnar pruning per metric
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
    }.reduce(_ union _)

  val q217 = Q("q217_table_profile",
    ProfileCols.map(c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY 1")) { (s, dir) =>
    profile(Tables.load(s, dir, "orders"), ProfileCols).orderBy("column")
  }

  val q218 = Q("q218_alarm_onset",
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
       |         greatest(0, cnt - st.mu - st.mu // ${TierFiftyNine.SlackDiv}) AS sp,
       |         greatest(0, st.mu - st.mu // ${TierFiftyNine.SlackDiv} - cnt) AS sn
       |  FROM dc JOIN st USING (event_type) WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn, d2.day_idx, d2.cnt,
       |         greatest(0, r.sp + d2.cnt - s2.mu - s2.mu // ${TierFiftyNine.SlackDiv}),
       |         greatest(0, r.sn + s2.mu - s2.mu // ${TierFiftyNine.SlackDiv} - d2.cnt)
       |  FROM rec r JOIN dc d2
       |    ON d2.event_type = r.event_type AND d2.rn = r.rn + 1
       |  JOIN st s2 ON s2.event_type = d2.event_type),
       |chart AS (
       |  SELECT rec.event_type, day_idx, sp, sn,
       |         CASE WHEN sp > st.mu // ${TierFiftyNine.AlarmDiv}
       |                OR sn > st.mu // ${TierFiftyNine.AlarmDiv}
       |              THEN 1 ELSE 0 END AS alarm
       |  FROM rec JOIN st ON st.event_type = rec.event_type),
       |fa AS (SELECT event_type, min(day_idx) AS fad
       |       FROM chart WHERE alarm = 1 GROUP BY 1),
       |sd AS (SELECT c.event_type, fa.fad,
       |              CASE WHEN c.sp >= c.sn THEN 'up' ELSE 'down' END AS side
       |       FROM chart c JOIN fa
       |         ON fa.event_type = c.event_type AND c.day_idx = fa.fad),
       |lz AS (SELECT c.event_type, CAST(max(c.day_idx) AS BIGINT) AS last_zero_day
       |       FROM chart c JOIN sd ON sd.event_type = c.event_type
       |       WHERE c.day_idx < sd.fad AND
       |             ((sd.side = 'up' AND c.sp = 0) OR
       |              (sd.side = 'down' AND c.sn = 0))
       |       GROUP BY 1),
       |ty AS (SELECT DISTINCT event_type FROM events)
       |SELECT ty.event_type, CAST(sd.fad AS BIGINT) AS first_alarm_day,
       |       sd.side, lz.last_zero_day
       |FROM ty LEFT JOIN sd ON sd.event_type = ty.event_type
       |LEFT JOIN lz ON lz.event_type = ty.event_type
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    onsetOf(Tables.load(s, dir, "events")).orderBy("event_type")
  }

  /** The q218 body over any events frame — exposed so the spec can
    * prove the no-alarm all-null branch on a constructed flat grid. */
  private[graft] def onsetOf(ev: DataFrame): DataFrame = {
    val chart = TierFiftyNine.cusumChart(TierThirtyTwo.dailyCounts(ev))
    val fa = chart.filter(col("alarm") === 1)
      .groupBy(col("event_type").as("fa_type"))
      .agg(min("day_idx").as("first_alarm_day"))
    val sd = chart.join(fa, col("event_type") === col("fa_type") &&
        col("day_idx") === col("first_alarm_day"))
      .select(col("fa_type"), col("first_alarm_day"),
        when(col("sp") >= col("sn"), "up").otherwise("down").as("side"))
    val lz = chart.join(sd, col("event_type") === col("fa_type") &&
        col("day_idx") < col("first_alarm_day") &&
        ((col("side") === "up" && col("sp") === 0) ||
          (col("side") === "down" && col("sn") === 0)))
      .groupBy(col("fa_type").as("lz_type"))
      .agg(max("day_idx").as("last_zero_day"))
    ev.select("event_type").distinct()
      .join(broadcast(sd), col("event_type") === col("fa_type"), "left")
      .join(broadcast(lz), col("event_type") === col("lz_type"), "left")
      .select("event_type", "first_alarm_day", "side", "last_zero_day")
  }

  val all: Seq[Q] = Seq(q217, q218)
}
