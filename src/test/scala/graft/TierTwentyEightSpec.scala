package graft

import graft.operators.TierTwentyEight
import org.apache.spark.sql.functions._

/** Tier-28 differentials: q140 against an in-memory signup→purchase delay
  * fold, q141 against a brute-force last-touch scan; consistency laws;
  * plan gates.
  */
class TierTwentyEightSpec extends SparkSpec {

  private lazy val events: Seq[(Long, Long, Long, String)] =
    Tables.load(spark, sf, "events")
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("q140 conversion latency ≡ in-memory delay fold (count + exact percentiles)") {
    val byUser = events.groupBy(_._3)
    val delays = byUser.values.flatMap { evs =>
      val signups = evs.filter(_._4 == "signup").map(_._2)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        val p = evs.filter(e => e._4 == "purchase" && e._2 >= s).map(_._2)
        if (p.isEmpty) None else Some((p.min - s) / 1000000L)
      }
    }.toSeq.sorted
    def pct(q: Double): Double = { // quantile_cont / Spark `percentile` semantics
      val pos = q * (delays.size - 1)
      val (lo, hi) = (pos.toInt, math.ceil(pos).toInt)
      delays(lo) + (pos - lo) * (delays(hi) - delays(lo))
    }
    def r6(x: Double): Double = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = TierTwentyEight.q140.run(spark, sf).collect().head
    assert(row.getLong(0) == delays.size.toLong)
    assert(row.getDouble(1) == r6(pct(0.5)), s"p50 ${row.getDouble(1)} vs ${r6(pct(0.5))}")
    assert(row.getDouble(2) == r6(pct(0.9)), s"p90 ${row.getDouble(2)} vs ${r6(pct(0.9))}")
    assert(delays.nonEmpty && delays.exists(_ > 0), "fixture must convert")
  }

  test("q141 attribution ≡ brute-force last-touch scan; purchases partition across channels") {
    val purchases = events.filter(_._4 == "purchase")
    val touches = events.filter(e => e._4 == "click" || e._4 == "view")
      .groupBy(_._3)
    val dayUs = 24L * 3600 * 1000000
    val credited = purchases.map { case (_, pts, u, _) =>
      val cands = touches.getOrElse(u, Seq.empty)
        .filter(t => t._2 < pts && t._2 >= pts - dayUs)
      if (cands.isEmpty) "none"
      else cands.maxBy(t => (t._2, t._1))._4 // latest ts, then larger event id
    }
    val expected = credited.groupBy(identity).map { case (ch, xs) => (ch, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = TierTwentyEight.q141.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == purchases.size.toLong,
      "every purchase lands in exactly one channel")
    assert(got.exists(x => x._1 == "click" || x._1 == "view"),
      "fixture must attribute something")
  }

  test("tier-28 plan gates: no CartesianProduct; q141's arg-max is agg, not Window") {
    for (q <- TierTwentyEight.all) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(800)}")
    }
    val p141 = TierTwentyEight.q141.run(spark, sf).queryExecution.executedPlan.toString
    assert(!p141.contains("Window"), s"q141: ${p141.take(800)}")
  }
}
