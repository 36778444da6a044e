package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 70 (round 11, nineteenth wave): the dense-series builder and
  * the weighted quantile — the two transforms between raw event grains
  * and every per-period model input.
  *
  *  - q223: GAP FILL + LOCF — per user the DENSE daily series over the
  *    user's own [first, last] active span: a date spine from one
  *    `sequence()` explode (span bounded by the CALENDAR, never data
  *    volume), missing days 0-filled for counts and LAST-OBSERVATION-
  *    CARRIED-FORWARD for the daily-spend state (the fill rule
  *    time-series features expect: absence of events means zero
  *    activity but UNCHANGED state). 460 genuine gap days at sf0.01 —
  *    probed, both fill rules live. LOCF via `last(_, ignoreNulls)`
  *    over the per-user ordered frame — partitioned, bounded per key.
  *  - q224: TOKEN-MASS LENGTH PERCENTILES — the weighted quantile the
  *    plain q50 length histogram can't answer: the doc length L at
  *    which half (p50) / ninety percent (p90) of the corpus TOKENS sit
  *    in docs of length ≤ L — what chunking/packing budgets should key
  *    on, since training cost follows token mass, not doc count.
  *    Exact integers: value-grouped token mass + one
  *    `Cumulative.runningSum` prefix + the cross-multiplied threshold
  *    `100·cum ≥ p·W` (no float division anywhere — the q199
  *    value-grouped machinery pointed at a weighted quantile).
  *
  * Scale: q223 is one keyed agg + a calendar-bounded explode + one
  * per-user window; q224 collapses to |distinct lengths| rows before
  * the two-pass prefix — never a doc-level sort.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star time-series /
  * corpus ops.
  */
object TierSeventy {

  val q223 = Q("q223_gap_fill",
    """WITH ud AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, min(d) AS lo, max(d) AS hi FROM ud GROUP BY 1),
      |spine AS (SELECT user_id, unnest(generate_series(lo, hi)) AS d FROM span),
      |f AS (
      |  SELECT s.user_id, s.d, coalesce(ud.n, 0) AS n_events, ud.cents
      |  FROM spine s LEFT JOIN ud ON ud.user_id = s.user_id AND ud.d = s.d)
      |SELECT user_id, CAST(d AS BIGINT) AS day,
      |       CAST(n_events AS BIGINT) AS n_events,
      |       CAST(last_value(cents IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY d
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cents_locf
      |FROM f ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    val ud = Tables.load(s, dir, "events")
      .groupBy(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    val spine = ud.groupBy("user_id").agg(min("d").as("lo"), max("d").as("hi"))
      .select(col("user_id"), explode(expr("sequence(lo, hi)")).as("d"))
    spine.join(ud, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d").as("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("cents"), ignoreNulls = true).over(
          Window.partitionBy("user_id").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0)).as("cents_locf"))
      .orderBy("user_id", "day")
  }

  val q224 = Q("q224_weighted_percentiles",
    """WITH dl AS (
      |  SELECT doc_id,
      |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |              AS BIGINT) AS toks
      |  FROM documents),
      |byLen AS (SELECT toks AS len, CAST(sum(toks) AS BIGINT) AS mass
      |          FROM dl GROUP BY 1),
      |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS w FROM byLen),
      |cum AS (SELECT len, CAST(sum(mass) OVER (ORDER BY len
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |          AS cw FROM byLen)
      |SELECT p, CAST(min(len) AS BIGINT) AS len_at_p, CAST(max(w) AS BIGINT)
      |         AS total_tokens
      |FROM cum CROSS JOIN tot
      |CROSS JOIN (SELECT unnest([50, 90]) AS p)
      |WHERE 100 * cw >= p * w
      |GROUP BY p ORDER BY p""".stripMargin) { (s, dir) =>
    import s.implicits._
    val byLen = Tables.load(s, dir, "documents")
      .select(size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
        .as("len"))
      .groupBy("len").agg(sum("len").as("mass"))
    val cum = Cumulative.runningSum(s, byLen, Seq(col("len")),
      col("mass"), "cw")
    val wTotal = byLen.agg(sum("mass")).collect()(0).getLong(0) // bounded scalar
    val ps = Seq(50L, 90L).toDF("p")
    cum.crossJoin(broadcast(ps))
      .filter(col("cw") * 100 >= col("p") * wTotal)
      .groupBy("p").agg(min("len").as("len_at_p"))
      .select(col("p"), col("len_at_p"), lit(wTotal).as("total_tokens"))
      .orderBy("p")
  }

  val all: Seq[Q] = Seq(q223, q224)
}
