package graft

import graft.operators.TierTwentyFive
import org.apache.spark.sql.functions._

/** Tier-25 differentials: q134/q135 against an in-memory replication of
  * the 6-hour-gap sessionization + transition counting; probability and
  * coverage laws; plan gates.
  */
class TierTwentyFiveSpec extends SparkSpec {

  /** In-memory within-session transitions at sf0.001 — (ts, event_id)
    * total order, break at gap ≥ 6 h (q36's rule). */
  private lazy val transitions: Seq[(String, String)] = {
    val rows = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gapUs = 6L * 3600 * 1000000
    rows.groupBy(_._1).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      ordered.foreach { case (_, us, _, et) =>
        if (prev != Long.MinValue && us - prev >= gapUs)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += et
        prev = us
      }
      sessions.flatMap(s => s.iterator.zip(s.iterator.drop(1)))
    }.toSeq
  }

  test("q134 session paths ≡ in-memory 6h-gap sessionization, top-20 pinned") {
    val expected = transitions.groupBy(identity)
      .map { case (p, xs) => (p._1, p._2, xs.size.toLong) }.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
    val got = TierTwentyFive.q134.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._3).sum > 0)
  }

  test("q135 markov next ≡ in-memory argmax; probability and coverage laws") {
    val counts = transitions.groupBy(identity)
      .map { case ((a, b), xs) => (a, b) -> xs.size.toLong }
    val byA = counts.groupBy(_._1._1)
    val expected = byA.toSeq.sortBy(_._1).map { case (a, m) =>
      val tot = m.values.sum
      val (bk, bn) = m.toSeq.map { case ((_, b), n) => (b, n) }
        .minBy { case (b, n) => (-n, b) }
      (a, bk, bn * 1000000L / tot)
    }
    val got = TierTwentyFive.q135.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    got.foreach { case (a, _, p) =>
      assert(p > 0 && p <= 1000000L, s"prob out of range for $a")
    }
    // coverage: exactly one row per event type that ever transitions out
    assert(got.map(_._1) == byA.keys.toSeq.sorted)
  }

  test("tier-25 plan gates: no CartesianProduct; q134 top-k is TakeOrdered; q135 no Window") {
    for (q <- TierTwentyFive.all) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(800)}")
    }
    val p134 = TierTwentyFive.q134.run(spark, sf).queryExecution.executedPlan.toString
    assert(p134.contains("TakeOrderedAndProject"), s"q134: ${p134.take(800)}")
    // the argmax is min(struct(·)) partial+final, not a ranking window
    val p135 = TierTwentyFive.q135.run(spark, sf).queryExecution.executedPlan.toString
    assert(!p135.contains("Window"), s"q135: ${p135.take(800)}")
  }
}
