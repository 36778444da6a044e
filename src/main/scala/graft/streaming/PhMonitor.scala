package graft.streaming

import graft.operators.TierNinety
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** One Page–Hinkley-charted day for one event type (append mode).
  * `pinned` = 1 when the type's μ was in the deployment's pinned map,
  * 0 when it ran unpinned (δ = λ = 0 — maximally sensitive, alarms on
  * any positive deviation): the visibility marker that tells an operator
  * a NEW type is alarming because nobody has pinned it yet, not because
  * it drifted (ADVICE r13). */
final case class PhPoint(event_type: String, day_idx: Long, cnt: Long,
    mean_run: Long, ph: Long, alarm: Long, pinned: Long)

private[streaming] final case class PhState(i: Long, s: Long, m: Long, mn: Long)

/** q260's Page–Hinkley drift chart as a LIVE monitor — the
  * [[HoltMonitor]] shape with FOUR longs of state per event type
  * (count, running sum, cumulative deviation, its minimum), each
  * closing day folded through [[TierNinety.phStep]] (the single shared
  * definition — batch chart and live monitor cannot drift). The level
  * self-calibrates (PH's point); only the slack δ and alarm λ read the
  * FROZEN per-type μ the deployment pins (the s37 frozen-stats shape —
  * q260 derives it from the full grid, a live deployment from its
  * phase-I window). A type absent from the pinned map runs with
  * δ = λ = 0 — maximally sensitive until someone pins it (documented,
  * not an error: the monitor must not drop data) — and every point it
  * emits carries `pinned = 0`, so the alarm storm a brand-new type
  * produces is visibly "unpinned type", not "drift".
  * Same delivery contract as s40/s45: day closes arrive per-type in
  * day order, micro-batches sorted on day before folding.
  */
object PhMonitor {

  /** Chart stream over `(event_type, day_idx, cnt)` day-close rows —
    * the streaming face of q260. */
  def chart(dayCloses: DataFrame, mu: Map[String, Long]): Dataset[PhPoint] = {
    val spark = dayCloses.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    dayCloses.select(col("event_type").cast("string"),
        col("day_idx").cast("long"), col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new PhMonitor(mu), TimeMode.None(), OutputMode.Append())
  }
}

final class PhMonitor(mu: Map[String, Long])
    extends StatefulProcessor[String, (String, Long, Long), PhPoint] {

  @transient private var st: ValueState[PhState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[PhState]("ph_state",
      Encoders.product[PhState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[PhPoint] = {
    val isPinned = mu.contains(key)
    val mu0 = mu.getOrElse(key, 0L)
    val (delta, lambda) = (mu0 / TierNinety.DeltaDiv, mu0 / TierNinety.LambdaDiv)
    var (i, s, m, mn) =
      if (st.exists()) { val p = st.get(); (p.i, p.s, p.m, p.mn) }
      else (0L, 0L, 0L, 0L)
    val out = rows.toSeq.sortBy(_._2).map { case (t, d, x) =>
      val (i2, s2, m2, mn2) = TierNinety.phStep(i, s, m, mn, x, delta)
      i = i2; s = s2; m = m2; mn = mn2
      val ph = m2 - mn2
      PhPoint(t, d, x, s2 / i2, ph, if (ph > lambda) 1L else 0L,
        if (isPinned) 1L else 0L)
    }
    st.update(PhState(i, s, m, mn))
    out.iterator
  }
}
