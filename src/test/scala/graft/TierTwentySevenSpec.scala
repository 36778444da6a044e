package graft

import graft.operators.TierTwentySeven
import org.apache.spark.sql.functions._

/** Tier-27 differentials: q138 against an in-memory event-to-state fold
  * (plus the SCD partition laws), q139 against a point-in-time scan of
  * the same intervals; plan gates.
  */
class TierTwentySevenSpec extends SparkSpec {

  private lazy val events: Seq[(Long, Long, Long, Long)] =
    Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), floor(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  private lazy val expectedHistory: Seq[(Long, Long, Option[Long], Long, Long)] =
    events.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      ordered.zipWithIndex.map { case ((_, us, _, cents), i) =>
        val next = if (i + 1 < ordered.size) Some(ordered(i + 1)._2) else None
        (u, us, next, cents, if (next.isEmpty) 1L else 0L)
      }
    }

  test("q138 SCD history ≡ in-memory event-to-state fold; partition laws") {
    val got = TierTwentySeven.q138.run(spark, sf)
      .select(col("user_id"), unix_micros(col("valid_from").cast("timestamp")),
        unix_micros(col("valid_to").cast("timestamp")), col("value_cents"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(x => (x._1, x._2, x._3.getOrElse(Long.MaxValue)))
    val exp = expectedHistory.sortBy(x => (x._1, x._2, x._3.getOrElse(Long.MaxValue)))
    assert(got == exp)
    // SCD laws: one open row per user; one history row per event; within a
    // user, every closed row's valid_to is the next row's valid_from
    val users = events.map(_._1).distinct.size.toLong
    assert(got.count(_._5 == 1L).toLong == users, "exactly one current row per user")
    assert(got.size == events.size, "one version per event")
    got.groupBy(_._1).values.foreach { rows =>
      val o = rows.sortBy(x => (x._2, x._3.getOrElse(Long.MaxValue)))
      o.sliding(2).foreach {
        case Seq(a, b) => assert(a._3.contains(b._2), "intervals must chain gap-free")
        case _ =>
      }
    }
  }

  test("q139 state as-of ≡ point-in-time scan of the intervals; coverage law") {
    val atUs = java.time.LocalDateTime.parse("2024-01-15T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val expected = expectedHistory
      .filter(h => h._2 <= atUs && h._3.forall(_ > atUs))
      .map(h => (h._1, h._2, h._4)).sortBy(_._1)
    val got = TierTwentySeven.q139.run(spark, sf)
      .select(col("user_id"), unix_micros(col("valid_from").cast("timestamp")),
        col("value_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // exactly one state per user whose history had begun by the instant
    val begun = expectedHistory.filter(_._2 <= atUs).map(_._1).distinct.size
    assert(got.size == begun, "one in-effect row per begun user")
    assert(got.map(_._1).distinct.size == got.size)
  }

  test("tier-27 plan gates: no CartesianProduct; the lead window partitions by user") {
    for (q <- TierTwentySeven.all) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(800)}")
      assert(!plan.contains("Exchange SinglePartition"),
        s"${q.name} must not globally sort: ${plan.take(800)}")
    }
  }
}
