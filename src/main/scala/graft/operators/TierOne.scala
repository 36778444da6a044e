package graft.operators

import graft.{Q, Tables}
import graft.Determinism._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 1 — the reference's core semantics re-expressed as batch queries over
  * the `events`/`documents` tables (SURVEY.md §2.3 q01-q11). Each mirrors a
  * concrete operator of `/root/reference`'s `Main.java` (file:line cited per
  * query); streaming equivalents live in [[graft.streaming.TweetPipelines]]
  * and share the same column logic (batch/stream parity is the design
  * invariant).
  *
  * Scale notes apply throughout: every query below is a pure declarative plan
  * — scan → (pushed) filter → hash-aggregate / window — that Catalyst plans as
  * partial+final aggregation with no driver-side collection, so the same code
  * runs at sf0.001 and at 100 TB (shuffle width follows
  * `spark.sql.shuffle.partitions` / AQE).
  */
object TierOne {

  /** Mirrors S1/S2 scan+project (Main.java:61-64, 202-219): source → project →
    * filter. The filter and the 4-column projection both reach the parquet
    * scan (PushedFilters / ReadSchema), so at 100 TB we read 4 of 6 columns
    * and skip `error` row groups via min/max stats.
    */
  val q01 = Q("q01_scan_filter_project",
    """SELECT event_id, ts, event_type, value
      |FROM events WHERE event_type <> 'error'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .filter(col("event_type") =!= "error")
      .select("event_id", "ts", "event_type", "value")
      .orderBy("event_id")
  }

  /** Mirrors S2 JSON deserialize (Main.java:202-219, Jackson → Tweet POJO):
    * `get_json_object` is codegen'd and never materializes a parsed tree per
    * row; malformed JSON yields null (the reference would NPE,
    * Main.java:213-217 — SURVEY.md §1.2 documents the upgrade).
    */
  val q02 = Q("q02_json_extract",
    """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
  }

  /** Mirrors F1 tokenizer (Main.java:180-200): flatMap → (token, 1) → keyed
    * sum becomes explode+groupBy. No UDTF: `split`+`explode` stay inside
    * whole-stage codegen; the aggregation is partial (map-side) before the
    * shuffle, so shuffle volume is O(vocabulary), not O(tokens).
    */
  val q03 = Q("q03_tokenize_explode",
    """SELECT word, CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  /** Mirrors F1's regex `#\w+` (Main.java:189). The corpus has no `#`, so the
    * same operator shape runs with a word-shaped pattern `s\w+`
    * (SURVEY.md §2.3 q04). Java and RE2 agree on `\w` = [A-Za-z0-9_] over
    * this ASCII corpus; matches are leftmost non-overlapping in both.
    */
  val q04 = Q("q04_regex_extract",
    """SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT unnest(regexp_extract_all(text, 's\w+')) AS token FROM documents)
      |GROUP BY token ORDER BY token""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(explode(regexp_extract_all(col("text"), lit("s\\w+"), lit(0))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy("token")
  }

  /** Mirrors W5/A6 tweets-per-second (Main.java:159-175): tumbling event-time
    * window count. 1-hour buckets over the test corpus; `window()` start ==
    * `date_trunc('hour')` because tumbling windows align to the epoch.
    */
  val q05 = Q("q05_tumbling_count",
    """SELECT date_trunc('hour', ts) AS window_start, CAST(count(*) AS BIGINT) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("cnt"))
      .orderBy("window_start")
  }

  /** Mirrors K1/W1/A1 keyed window sum (Main.java:86-89 + CustomSumAggregator
    * Main.java:358-383): keyBy(hashtag) × window × incremental sum. The
    * manual accumulator becomes `sum()` — Catalyst plans the identical
    * partial→shuffle→final shape automatically. DECIMAL sum for cross-engine
    * determinism (see [[graft.Determinism]]).
    */
  val q06 = Q("q06_keyed_window_sum",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(f6(sum(dec2(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  private val trendingOracle =
    """WITH c AS (
      |  SELECT date_trunc('hour', ts) AS window_start, event_type,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY window_start ORDER BY cnt DESC, event_type ASC) AS rn
      |  FROM c)
      |SELECT window_start, event_type, cnt FROM r WHERE rn = 1
      |ORDER BY window_start""".stripMargin

  /** Mirrors pipeline B (Main.java:104-146): global window → manual HashMap
    * aggregate → linear arg-max scan. The HashMap IS a hash aggregate
    * (HashAggregateExec); the scan IS an arg-max — expressed as
    * `row_number()=1` with the tie-break pinned to event_type ASC (the
    * reference's tie-break is iteration order, i.e. nondeterministic —
    * SURVEY.md §2.1 A4). Unlike the reference (parallelism forced to 1,
    * Main.java:105), the per-window arg-max here shuffles by window and runs
    * wide.
    */
  val q07 = Q("q07_trending_single_stage", trendingOracle) { (s, dir) =>
    val counts = Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val rank = Window.partitionBy(col("w")).orderBy(col("cnt").desc, col("event_type").asc)
    counts.withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))
      .orderBy("window_start")
  }

  /** Mirrors pipeline A (Main.java:85-102): the two-stage partial+final
    * variant — pre-aggregate per (15-min sub-window, key), then merge
    * sub-aggregates into the hour and take the per-window arg-max. Same
    * answer as q07 by construction (the reference computes both and writes
    * two measurements); the two-stage shape is what survives at scale: the
    * second stage sees O(windows × keys) rows, not O(events).
    */
  val q08 = Q("q08_trending_two_stage",
    """WITH pre AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w15, event_type,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT date_trunc('hour', w15) AS window_start, event_type,
      |         CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM pre GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY window_start ORDER BY cnt DESC, event_type ASC) AS rn
      |  FROM c)
      |SELECT window_start, event_type, cnt FROM r WHERE rn = 1
      |ORDER BY window_start""".stripMargin) { (s, dir) =>
    val pre = Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w15"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val hourly = pre
      .groupBy(window(col("w15.start"), "1 hour").as("w"), col("event_type"))
      .agg(sum(col("cnt")).as("cnt"))
    val rank = Window.partitionBy(col("w")).orderBy(col("cnt").desc, col("event_type").asc)
    hourly.withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))
      .orderBy("window_start")
  }

  /** Mirrors W4/A5 running total (Main.java:148-157): global unbounded window
    * + running sum, re-emitted per trigger. Batch analog: cumulative count
    * over the total (ts, event_id) order. The declared plan is the 100 TB
    * shape — [[graft.operators.Cumulative.runningCount]]'s two-pass prefix
    * sum (range-partitioned sort, per-partition counts, broadcast offsets);
    * the single-partition `count(*) OVER (ORDER BY …)` window stays as the
    * ORACLE definition and [[graft.CumulativeSpec]] pins row-for-row
    * equality of the two formulations.
    */
  val q09 = Q("q09_running_total",
    """SELECT event_id, ts,
      |       CAST(count(*) OVER (ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cnt
      |FROM events ORDER BY ts, event_id""".stripMargin) { (s, dir) =>
    Cumulative.runningCount(s, Tables.load(s, dir, "events"))
      .orderBy("ts", "event_id")
  }

  /** Mirrors A3 maxBy (Main.java:100): arg-max record with pinned tie-break
    * (event_id ASC; Flink's maxBy keeps first-seen — nondeterministic).
    * Planned as TakeOrderedAndProject: per-partition top-1 then a 1-row
    * merge, no global sort.
    */
  val q10 = Q("q10_global_argmax",
    """SELECT event_id, event_type, value FROM events
      |ORDER BY value DESC, event_id ASC LIMIT 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .select("event_id", "event_type", "value")
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(1)
  }

  /** Mirrors P1-P4/X2 sink projection (Main.java:222-277, InfluxDBPoint):
    * decorate the trending result with a literal measurement name and the
    * window-end time — the reference's `InfluxDBPoint{measurement, time,
    * fields}` as flat typed columns (SURVEY.md §1.4).
    */
  val q11 = Q("q11_sink_projection",
    s"""SELECT 'TrendingHashTagFlink1' AS measurement,
       |       window_start + INTERVAL 1 HOUR AS time,
       |       event_type AS hashtag, cnt
       |FROM ($trendingOracle)
       |ORDER BY time""".stripMargin) { (s, dir) =>
    q07.run(s, dir)
      .select(
        lit("TrendingHashTagFlink1").as("measurement"),
        (col("window_start") + expr("INTERVAL 1 HOUR")).as("time"),
        col("event_type").as("hashtag"),
        col("cnt"))
      .orderBy("time")
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11)
}
