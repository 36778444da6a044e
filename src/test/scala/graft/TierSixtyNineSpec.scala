package graft

import graft.operators.TierSixtyNine
import org.apache.spark.sql.functions._

/** Tier-69 differentials: q221 against a brute-force in-memory trailing
  * 24 h fold (frame width proven DATA-driven, not row-count-driven);
  * q222's cube decoded by grouping_id — the grand total, the plane
  * ROLLUP omits, and per-plane conservation.
  */
class TierSixtyNineSpec extends SparkSpec {

  test("q221 ≡ brute-force trailing 24h; width is data-driven") {
    val got = TierSixtyNine.q221.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("sec"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val want = ev.map { case (u, eid, sec, _) =>
      val in = byUser(u).filter(r => r._3 >= sec - 86399 && r._3 <= sec)
      (u, eid, in.length.toLong, in.map(_._4).sum)
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(got == want, s"range-frame mismatch: ${got.take(3)} vs ${want.take(3)}")
    assert(got.map(_._3).distinct.size > 1,
      "frame membership must vary with event-time density (data-driven width)")
  }

  test("q222 cube decodes by grouping_id: grand total, rollup-missing plane, conservation") {
    val rows = TierSixtyNine.q222.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val total = Tables.load(spark, sf, "orders").count()
    // gid 3 = grand total (both columns are subtotal markers)
    assert(rows.filter(_._3 == 3L) == Seq(("(all)", "(all)", 3L, total)))
    // gid 2 = the (priority)-only plane ROLLUP's strict hierarchy omits
    val prioPlane = rows.filter(_._3 == 2L)
    assert(prioPlane.nonEmpty && prioPlane.forall(_._1 == "(all)"),
      "the status-marginal plane must exist — CUBE's addition over ROLLUP")
    assert(prioPlane.map(_._4).sum == total, "each plane conserves the row count")
    assert(rows.filter(_._3 == 1L).map(_._4).sum == total)
    assert(rows.filter(_._3 == 0L).map(_._4).sum == total)
    // the q16 rollup is exactly the cube minus the gid-2 plane
    val rollup = graft.operators.TierTwo.q16.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.filter(_._3 != 2L).map(r => (r._1, r._2, r._4)).toSet == rollup,
      "cube minus the marginal plane must equal the declared rollup")
  }
}
