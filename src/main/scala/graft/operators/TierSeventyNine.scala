package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 79 (round 12, twenty-sixth wave): trend-adaptive monitoring and
  * the second privacy audit.
  *
  *  - q237: HOLT LINEAR CHART (Holt 1957 double exponential smoothing) —
  *    the trend-adaptive member of the control-chart family: per event
  *    type over the q149 daily grid, exact-integer level+trend state
  *    `l ← (x + 7·(l+b)) div 8`, `b ← ((l − l_prev) + 3·b_prev) div 4`
  *    (α = 1/8, β = 1/4 — the q197 dyadic-fraction convention), flag
  *    when the ONE-STEP FORECAST `f = l_prev + b_prev` misses by
  *    > [[HoltK]] % of max(|f|, 1). Where q197's EWMA lags a steady
  *    ramp (its forecast is the smoothed LEVEL — systematically behind
  *    a trend, so a persistent drift keeps tripping it), Holt's trend
  *    term absorbs the ramp and flags only genuine departures FROM the
  *    trend — the spec pins that contrast on a constructed linear ramp.
  *    Signed state: (l − l_prev) and b go negative on down-trends;
  *    truncation toward zero agrees across Scala `/`, DuckDB `//` (the
  *    q198 signed-division law). Sequential recurrence ⇒ the q197
  *    mapPartitions shape — one partition per type, O(1) carried state;
  *    oracle is a recursive CTE through the same literal arithmetic.
  *  - q238: L-DIVERSITY AUDIT (Machanavajjhala et al. 2007) — the
  *    k-anonymity companion: a group can be large (k-anonymous) yet
  *    reveal its SENSITIVE attribute if every member shares it.
  *    QI = (lang, n_chars div 50 size bucket), sensitive = source
  *    (provenance — the attribute a release may not want inferable from
  *    metadata): per QI group `(n_rows, l_distinct, l_diverse)` with
  *    l ≥ [[LDiv]]; 7 of 53 groups violate at sf0.01 (probed — the
  *    finer bucket exists BECAUSE (lang, source) itself probed
  *    all-diverse at ≥ 9).
  *
  * Scale: q237 is one keyed count + a per-type O(1) fold (calendar-
  * bounded grid); q238 is one keyed two-agg count — nothing global.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star monitoring /
  * privacy ops.
  */
object TierSeventyNine {

  private[graft] val HoltK = 20L
  private[graft] val LDiv = 3L

  /** THE Holt step — one definition for batch q237 (and any future live
    * twin; the q197 `ewmaStep` contract). `(first, l, b, x)` →
    * `(l', b', flag)`.
    *
    * Division note: the `/` here TRUNCATES toward zero — deliberately,
    * because the trend numerator `(l2−l)+3b` goes negative on any
    * decreasing series and DuckDB's `//` truncates toward zero too
    * (the q198 rule: −7//2 = −3, same as Java), so the oracle matches
    * bit for bit with NO floor correction. Do not "fix" this to
    * `Math.floorDiv` to match the repo's floor-division prose
    * convention: that changes every negative-trend step by one and
    * breaks the cross-engine law. */
  private[graft] def holtStep(first: Boolean, l: Long, b: Long, x: Long)
      : (Long, Long, Long) = {
    if (first) (x, 0L, 0L)
    else {
      val f = l + b
      val l2 = (x + 7 * f) / 8
      val b2 = ((l2 - l) + 3 * b) / 4
      val flag = if (100L * math.abs(x - f) > HoltK * math.max(math.abs(f), 1L)) 1L else 0L
      (l2, b2, flag)
    }
  }

  /** The sequential Holt fold over a (event_type, day_idx, cnt) grid —
    * q197's `ewmaChart` shape: one partition per type, sorted days,
    * O(1) carried (level, trend) state. */
  private[graft] def holtChart(dc: DataFrame): DataFrame = {
    val s = dc.sparkSession
    import s.implicits._
    dc.select(col("event_type").cast("string"), col("day_idx").cast("long"),
        col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .repartition(col("event_type"))
      .sortWithinPartitions("event_type", "day_idx")
      .mapPartitions { it =>
        var curType: String = null
        var l = 0L
        var b = 0L
        it.map { case (t, d, x) =>
          val (l2, b2, flag) = holtStep(t != curType, l, b, x)
          curType = t
          l = l2; b = b2
          (t, d, x, l2, b2, flag)
        }
      }
      .toDF("event_type", "day_idx", "cnt", "level", "trend", "flag")
  }

  val q237 = Q("q237_holt_chart",
    s"""WITH RECURSIVE dc AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
       |         CAST(count(*) AS BIGINT) AS cnt,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY epoch_us(ts) // 86400000000) AS rn
       |  FROM events GROUP BY 1, 2),
       |rec AS (
       |  SELECT event_type, rn, day_idx, cnt,
       |         cnt AS l, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS flag
       |  FROM dc WHERE rn = 1
       |  UNION ALL
       |  SELECT d.event_type, d.rn, d.day_idx, d.cnt,
       |         (d.cnt + 7 * (r.l + r.b)) // 8,
       |         (((d.cnt + 7 * (r.l + r.b)) // 8 - r.l) + 3 * r.b) // 4,
       |         CAST(CASE WHEN 100 * abs(d.cnt - (r.l + r.b))
       |                        > $HoltK * greatest(abs(r.l + r.b), 1)
       |              THEN 1 ELSE 0 END AS BIGINT)
       |  FROM rec r JOIN dc d
       |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
       |SELECT event_type, day_idx, cnt, CAST(l AS BIGINT) AS level,
       |       CAST(b AS BIGINT) AS trend, flag
       |FROM rec ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    holtChart(TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events")))
      .orderBy("event_type", "day_idx")
  }

  /** q238's audit over ANY frame, QI column pair and sensitive column —
    * the extracted library face. Output
    * `(<c1>, <c2>, n_rows, l_distinct, l_diverse)`. */
  private[graft] def lDiversityOver(df: DataFrame, c1: String, c2: String,
      sensitive: String, l: Long = LDiv): DataFrame =
    df.groupBy(c1, c2)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("l_distinct"))
      .select(col(c1), col(c2), col("n_rows"), col("l_distinct"),
        when(col("l_distinct") >= l, 1L).otherwise(0L).as("l_diverse"))
      .orderBy(c1, c2)

  val q238 = Q("q238_l_diversity",
    s"""SELECT lang, n_chars // 50 AS size_bkt,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(count(DISTINCT source) AS BIGINT) AS l_distinct,
       |       CAST(CASE WHEN count(DISTINCT source) >= $LDiv THEN 1 ELSE 0 END
       |            AS BIGINT) AS l_diverse
       |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    lDiversityOver(Tables.load(s, dir, "documents")
        .select(col("lang"), expr("n_chars div 50").as("size_bkt"), col("source")),
      "lang", "size_bkt", "source")
  }

  val all: Seq[Q] = Seq(q237, q238)
}
