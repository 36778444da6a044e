package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input record contract, pinned by the reference's `Tweet` POJO
  * (`/root/reference` Tweet.java:10-21): `text` is the payload, `createdAt`
  * is epoch millis event time (bound at Main.java:66-73), `lang` is parsed
  * but unused downstream. Unknown JSON properties are ignored.
  */
final case class Tweet(text: String, createdAt: Long, lang: String)

/** The reference's four streaming pipelines (Main.java:85-175) as composable
  * Structured Streaming transforms. Batch/stream parity is the design
  * invariant: every transform here is a plain DataFrame function that also
  * runs on batch frames — the Tier-1 batch queries ([[graft.operators.TierOne]])
  * carry the oracle-checked correctness burden for the same column logic,
  * and the specs in `src/test/scala/graft` drive these through
  * MemoryStream.
  *
  * Operator mapping (SURVEY.md §2.1): S2→[[parse]], S3→[[withLateness]],
  * F1→[[hashtags]], K1/W1/A1→[[keyedWindowCounts]], A3/A4→[[trendingPerWindow]],
  * W4/A5→[[runningTotal]], W5/A6→[[perSecondCounts]], T1→update/complete
  * output with `Trigger.ProcessingTime` (closest Spark analog of Flink's
  * repeated non-purging 5 s trigger — SURVEY.md §2.1 T1 documents the
  * semantic alignment).
  */
object TweetPipelines {

  /** Pinned input schema — never inferred (SURVEY.md §1.2). */
  val tweetSchema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("createdAt", LongType),
    StructField("lang", StringType)))

  /** Kafka source (reference S1, Main.java:57-64): value bytes as UTF-8
    * strings from the subscribed topic. Requires the spark-sql-kafka
    * connector jar on the classpath (not shipped in this build environment,
    * where no broker exists either) — tests drive the identical `value`
    * column through MemoryStream instead.
    */
  def kafkaSource(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** S2 JSON deserialize (Main.java:202-219). The reference returns null on
    * malformed JSON and would NPE downstream; `from_json` yields a null
    * struct which we filter — same observable behavior on clean data,
    * defined behavior on bad records (SURVEY.md §1.2).
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), tweetSchema).as("t"))
      .filter(col("t").isNotNull && col("t.text").isNotNull)
      .select(col("t.text").as("text"), col("t.createdAt").as("createdAt"),
        col("t.lang").as("lang"))
      .withColumn("ts", timestamp_millis(col("createdAt")))

  /** S3 watermark (Main.java:66-73): bounded out-of-orderness 300 s; later
    * rows are dropped by stateful operators — the reference's silent
    * late-drop, same semantics.
    */
  def withLateness(tweets: DataFrame, delay: String = "300 seconds"): DataFrame =
    tweets.withWatermark("ts", delay)

  /** F1 tokenizer (Main.java:180-200, regex `#\w+` at :189): 0..n hashtags
    * per tweet. Built-in `regexp_extract_all` + `explode` — stays inside
    * whole-stage codegen, no UDTF.
    */
  def hashtags(tweets: DataFrame): DataFrame =
    tweets.select(col("ts"),
      explode(regexp_extract_all(col("text"), lit("#\\w+"), lit(0))).as("hashtag"))

  /** K1/W1/A1 (Main.java:86-89): per-hashtag sliding event-time window sum.
    * Flink's manual `CustomSumAggregator` (Main.java:358-383) is exactly
    * Catalyst's partial+final streaming aggregation; window state holds one
    * accumulator per (window, hashtag).
    */
  def keyedWindowCounts(tags: DataFrame,
      size: String = "30 seconds", slide: String = "5 seconds"): DataFrame =
    tags.groupBy(window(col("ts"), size, slide), col("hashtag"))
      .agg(count(lit(1)).as("cnt"))

  /** A3/A4 arg-max per window (Main.java:100, 107-144) with the
    * deterministic tie-break (hashtag ASC; the reference's is iteration
    * order). Analytic `row_number` is not available inside a streaming agg,
    * so this runs where the reference's second stage ran: over the
    * materialized counts — per micro-batch via `foreachBatch`, or over the
    * complete-mode sink table. Same column logic as batch q07.
    */
  def trendingPerWindow(counts: DataFrame): DataFrame = {
    val rank = Window.partitionBy(col("window"))
      .orderBy(col("cnt").desc, col("hashtag").asc)
    counts.withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("window.end").as("window_end"), col("hashtag"), col("cnt"))
  }

  /** W4/A5 running total (Main.java:148-157): global unbounded aggregation,
    * re-emitted every trigger in update mode — Flink's GlobalWindows + sum
    * + 5 s ContinuousProcessingTimeTrigger.
    */
  def runningTotal(tweets: DataFrame): DataFrame =
    tweets.agg(count(lit(1)).as("total_tweets"), max(col("ts")).as("as_of"))

  /** W5/A6 tweets-per-second (Main.java:159-175): tumbling 1 s event-time
    * count, appended once the watermark passes window end.
    */
  def perSecondCounts(tweets: DataFrame): DataFrame =
    tweets.groupBy(window(col("ts"), "1 second"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.end").as("window_end"), col("cnt"))

  /** Streaming exact deduplication — the streaming face of batch q22 (and
    * of the Tier-3/4 dedup family): drop repeated payloads across
    * micro-batches using keyed state, bounded by the watermark so state for
    * expired event times is reclaimed (unbounded dedup state is the classic
    * streaming-job OOM at scale). Built-in `dropDuplicatesWithinWatermark`
    * — the state key is the sha2 digest, not the payload, for the same
    * shuffle-width reason as q22.
    */
  def dedupedTweets(tweets: DataFrame): DataFrame =
    tweets.withColumn("text_hash", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("text_hash")
      .drop("text_hash")

  /** Pipeline A's two-stage shape (Main.java:85-102) as chained stateful
    * aggregations (Spark ≥3.4 multiple-stateful-operator support, append
    * mode): stage 1 pre-aggregates per (tumbling sub-window, hashtag);
    * stage 2 re-windows the sub-aggregates. At scale stage 2 sees
    * O(windows × keys) rows, not O(tweets) — the same partial+final
    * argument as batch q08.
    */
  def twoStageCounts(tags: DataFrame,
      stage1: String = "5 seconds", stage2: String = "30 seconds"): DataFrame =
    tags.groupBy(window(col("ts"), stage1), col("hashtag"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(window(col("window"), stage2), col("hashtag"))
      .agg(sum(col("cnt")).as("cnt"))

  /** A completed hashtag burst: `cnt` tweets for `hashtag` whose event
    * times span [startMs, endMs], closed because no further occurrence
    * arrived within the gap before the watermark passed. */
  final case class Burst(hashtag: String, startMs: Long, endMs: Long, cnt: Long)

  /** Internal burst accumulator (public: Catalyst codegen instantiates it). */
  final case class BurstState(startMs: Long, endMs: Long, cnt: Long)

  /** Custom keyed state via `flatMapGroupsWithState` — the escape hatch for
    * stateful semantics the built-in windows can't express (here: session
    * bursts that emit a CLOSED summary record with start/end/count, where
    * `session_window` would only give the aggregate). Per hashtag the state
    * is one (start, end, cnt) triple; an event-time timeout at
    * `end + gap` fires once the watermark passes it, emitting the burst
    * and clearing state — so state size is O(active keys), reclaimed by
    * watermark progress exactly like the built-in operators.
    *
    * Batch counterpart: q36's `session_window` aggregation (oracle-checked)
    * pins the grouping semantics; this operator's own spec (s11) pins the
    * burst lifecycle across micro-batches.
    */
  def hashtagBursts(tags: DataFrame, gapMs: Long = 60000L): org.apache.spark.sql.Dataset[Burst] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = tags.sparkSession
    import spark.implicits._
    // the watermark tag travels WITH the ts column — it must reach the
    // stateful operator as a timestamp (converting to epoch-millis upstream
    // strips the tag and EventTimeTimeout refuses to plan)
    tags.select(col("hashtag"), col("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BurstState, Burst](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (tag: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[BurstState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Burst(tag, s.startMs, s.endMs, s.cnt))
          } else {
            // micro-batch rows arrive unordered; fold them into a span.
            // Splitting bursts WITHIN a batch is approximated by the span
            // merge (same stance as session_window's merge); ACROSS batches
            // the gap is enforced both by the event-time timeout and — when
            // new data for the key arrives entirely beyond the gap — by
            // closing the held burst right here (a key active in every
            // batch would otherwise never time out and its bursts would
            // merge unboundedly).
            var (nStart, nEnd, nCnt) = (Long.MaxValue, Long.MinValue, 0L)
            rows.foreach { case (_, t) =>
              val at = t.getTime
              if (at < nStart) nStart = at
              if (at > nEnd) nEnd = at
              nCnt += 1
            }
            val closed = state.getOption match {
              case Some(s) if nStart > s.endMs + gapMs =>
                Iterator.single(Burst(tag, s.startMs, s.endMs, s.cnt))
              case Some(s) =>
                nStart = math.min(nStart, s.startMs)
                nEnd = math.max(nEnd, s.endMs)
                nCnt += s.cnt
                Iterator.empty
              case None => Iterator.empty
            }
            state.update(BurstState(nStart, nEnd, nCnt))
            state.setTimeoutTimestamp(nEnd + gapMs)
            closed
          }
      }
  }

  /** P1-P4 sink projections (Main.java:222-277): decorate with the literal
    * measurement name and the window-end event time. The reference's P3
    * wall-clock-timestamp bug (Main.java:260, author-acknowledged) is fixed
    * by always using event/window time (SURVEY.md §4.4).
    */
  def toInfluxPoint(df: DataFrame, measurement: String,
      timeCol: Column, fieldCols: Map[String, Column]): DataFrame = {
    val fields = fieldCols.toSeq.sortBy(_._1).flatMap { case (n, c) =>
      Seq(lit(n), c.cast("string"))
    }
    df.select(
      lit(measurement).as("measurement"),
      timeCol.cast("long").as("time_ms"),
      map(fields: _*).as("fields"))
  }
}
