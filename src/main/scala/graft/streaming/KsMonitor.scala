package graft.streaming

import graft.operators.TierNinetySeven
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One KS-drift readout for one key after a batch that touched it.
  * `pinned` = 1 when the key has a frozen reference; 0 when it runs
  * unpinned (d_num = d_ppm = −1 — the readout says "counting, nobody
  * pinned a reference yet", the ADVICE-r13 visibility convention, never
  * a silent drop). */
final case class KsPoint(event_type: String, n_live: Long, d_num: Long,
    d_ppm: Long, pinned: Long)

/** q273's two-sample KS as a LIVE DRIFT MONITOR against a FROZEN
  * reference — the distribution sibling of the level monitors
  * (CUSUM s41, EWMA s40, Page–Hinkley s48): where those watch a mean,
  * this watches the whole CDF of an arriving value stream per key.
  *
  * Deployment pins, per key, the reference CDF as sorted
  * `(grid value, cumulative count)` pairs (e.g. a trusted window's
  * value-grouped counts — the s37 frozen-stats shape). State is the
  * live side's per-bucket counts (`MapState[Int, Long]`, bounded by
  * grid size + 1 — never the raw values), each micro-batch folds its
  * arrivals in by binary search on the grid, and every touched key
  * emits the current readout through the ONE shared fold
  * ([[TierNinetySeven.ksGridStep]] — live monitor and batch replay
  * cannot drift). Grid-KS is exact-integer (the q273
  * cross-multiplication) and a LOWER bound of the exact two-sample D —
  * equal to it whenever live values land on grid points
  * (KsMonitorSpec pins both).
  *
  * A key absent from the reference map still counts its arrivals
  * (overflow bucket) and emits `pinned = 0` with −1 distances.
  *
  * `maxLive` (ADVICE r14): tumbling count-window discipline for a
  * long-running monitor — once a key's live count reaches it, the
  * readout is emitted and the key's buckets CLEAR, so the next arrival
  * starts a fresh window (drift is judged per window of recent
  * arrivals, the CUSUM-reset posture, instead of an ever-staler
  * all-history CDF). The default keeps all history; the ppm arithmetic
  * is BigInt-exact either way ([[TierNinetySeven.ksGridStep]]).
  */
final class KsMonitor(ref: Map[String, IndexedSeq[(Long, Long)]],
    maxLive: Long = Long.MaxValue)
    extends StatefulProcessor[String, (String, Long), KsPoint] {

  @transient private var st: MapState[Int, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[Int, Long]("ks_counts",
      Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

  /** Bucket of value x: the smallest grid index i with x ≤ g_i, or
    * grid.size (overflow) when x exceeds every grid point. */
  private def bucketOf(grid: IndexedSeq[Long], x: Long): Int = {
    var lo = 0
    var hi = grid.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (grid(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[KsPoint] = {
    val pinnedRef = ref.get(key)
    val grid = pinnedRef.fold(IndexedSeq.empty[Long])(_.map(_._1))
    var touched = false
    rows.foreach { case (_, x) =>
      val b = bucketOf(grid, x)
      st.updateValue(b, (if (st.containsKey(b)) st.getValue(b) else 0L) + 1L)
      touched = true
    }
    if (!touched) Iterator.empty
    else {
      val counts = st.iterator().map { case (k, v) => k -> v }.toMap
      val out = pinnedRef match {
        case Some(rc) =>
          val (n, num, ppm) = TierNinetySeven.ksGridStep(counts, rc.map(_._2))
          KsPoint(key, n, num, ppm, 1L)
        case None =>
          KsPoint(key, counts.valuesIterator.sum, -1L, -1L, 0L)
      }
      if (out.n_live >= maxLive) st.clear() // tumbling window boundary
      Iterator.single(out)
    }
  }
}

object KsMonitor {

  /** Drift-readout stream over a `(event_type, v)` value feed against
    * the per-key frozen reference CDFs. */
  def watch(values: DataFrame, ref: Map[String, IndexedSeq[(Long, Long)]],
      maxLive: Long = Long.MaxValue): Dataset[KsPoint] = {
    val spark = values.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    values.select(col("event_type").cast("string"), col("v").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new KsMonitor(ref, maxLive), TimeMode.None(),
        OutputMode.Append())
  }
}
