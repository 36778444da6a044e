package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import TweetPipelines.{Burst, BurstState}

/** The burst detector on Spark 4's `transformWithState` API — the successor
  * of `flatMapGroupsWithState` ([[TweetPipelines.hashtagBursts]] is the
  * classic-API twin; BurstParitySpec pins both to the same output). What the
  * new API buys at scale:
  *
  *  - typed state handles (`ValueState`/`ListState`/`MapState`) with
  *    per-state TTL, living in the RocksDB state store (required provider)
  *    — state no longer round-trips through one opaque blob per key;
  *  - FIRST-CLASS TIMERS: `registerTimer`/`deleteTimer` per key, with
  *    expiry delivered to [[handleExpiredTimer]] — the burst close fires
  *    exactly once at `end + gap`, and extending a burst DELETES the old
  *    timer instead of relying on a stale-timestamp check.
  *
  * Semantics are identical to the classic twin: a burst closes when the
  * watermark passes `end + gap` (timer), or inline when new data for the
  * key arrives entirely beyond the gap.
  */
final class BurstProcessor(gapMs: Long)
    extends StatefulProcessor[String, (String, java.sql.Timestamp), Burst] {

  @transient private var state: ValueState[BurstState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[BurstState]("burst",
      Encoders.product[BurstState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[Burst] = {
    var (nStart, nEnd, nCnt) = (Long.MaxValue, Long.MinValue, 0L)
    rows.foreach { case (_, t) =>
      val at = t.getTime
      if (at < nStart) nStart = at
      if (at > nEnd) nEnd = at
      nCnt += 1
    }
    val closed: Iterator[Burst] =
      if (state.exists()) {
        val s = state.get()
        getHandle.deleteTimer(s.endMs + gapMs) // burst is extended or closed — either way this timer is stale
        if (nStart > s.endMs + gapMs) Iterator.single(Burst(key, s.startMs, s.endMs, s.cnt))
        else {
          nStart = math.min(nStart, s.startMs)
          nEnd = math.max(nEnd, s.endMs)
          nCnt += s.cnt
          Iterator.empty
        }
      } else Iterator.empty
    state.update(BurstState(nStart, nEnd, nCnt))
    getHandle.registerTimer(nEnd + gapMs)
    closed
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Burst] = {
    // timers are deleted on extension, so an expiry always matches the live
    // burst — but stay defensive about state cleared by other paths
    if (!state.exists()) Iterator.empty
    else {
      val s = state.get()
      state.clear()
      Iterator.single(Burst(key, s.startMs, s.endMs, s.cnt))
    }
  }
}

object BurstProcessor {

  /** [[TweetPipelines.hashtagBursts]] on the transformWithState API. */
  def bursts(tags: DataFrame, gapMs: Long = 60000L): Dataset[Burst] = {
    val spark = tags.sparkSession
    import spark.implicits._
    tags.select(col("hashtag"), col("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new BurstProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
