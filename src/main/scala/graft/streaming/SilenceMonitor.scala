package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** A silence alert: the key went quiet — its last-seen event time,
  * emitted ONCE when the event-time watermark crosses
  * last_seen + silenceMs with no newer event having arrived. */
final case class SilenceAlert(user_id: Long, last_seen_ms: Long)

/** Per-key inactivity detection via `transformWithState` EVENT-TIME
  * TIMERS — the push complement of q225's batch gap scan: the batch
  * query finds silence episodes retrospectively; this fires the moment
  * the WATERMARK proves one (no event for `silenceMs` of event time),
  * which no input-driven operator can do — the alert is triggered by
  * the ABSENCE of data, so something other than the key's own rows
  * must wake the key. That something is a registered timer.
  *
  * Mechanics: each arriving event advances the key's last-seen state,
  * DELETES the previously registered timer and registers
  * last_seen + silenceMs (one live timer per key). When a timer fires,
  * the expiry is checked against the CURRENT state — a stale timer
  * (superseded by a newer event whose delete raced a concurrent
  * registration) is ignored, so correctness never depends on delete
  * ordering. The alert CLEARS the key's state (episode closed); a
  * returning key re-seeds. State: one long + one timer per LIVE key —
  * a dead key's state is dropped with its one alert.
  *
  * Scale: O(live keys) state and timers in the RocksDB store; alerts
  * are append-mode rows driven by watermark advance, so a silent key
  * costs nothing until its one alert fires.
  */
final class SilenceMonitor(silenceMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SilenceAlert] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("last_seen",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[SilenceAlert] = {
    val maxMs = rows.map(_._2.getTime).max
    val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    if (maxMs > prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev + silenceMs)
      lastSeen.update(maxMs)
      getHandle.registerTimer(maxMs + silenceMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SilenceAlert] = {
    val ls = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    // guard: only the timer matching the CURRENT last-seen may alert —
    // a superseded timer that survived is provably stale
    if (ls != Long.MinValue && expiredTimerInfo.getExpiryTimeInMs() == ls + silenceMs) {
      // the alert CLOSES the episode: clear the key's state so a
      // permanently dead key holds nothing (state really is O(live
      // keys), r11 ADVICE) — a returning key starts a fresh episode
      // (its next event re-seeds last_seen and a new timer)
      lastSeen.clear()
      Iterator(SilenceAlert(key, ls))
    } else Iterator.empty
  }
}

object SilenceMonitor {

  /** Silence alerts over a `(user_id, ts)` event stream: one alert per
    * key each time the watermark proves `silenceMs` of event-time
    * inactivity. Watermark delay 0 — the caller's replay cadence IS the
    * detection cadence. */
  def alerts(events: DataFrame, silenceMs: Long): Dataset[SilenceAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SilenceMonitor(silenceMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
