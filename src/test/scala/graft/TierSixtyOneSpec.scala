package graft

import graft.operators.TierSixtyOne
import org.apache.spark.sql.functions._

/** Tier-61 differentials: q205 against an in-memory last-writer-wins
  * fold (tombstone branch proven live), the incremental snapshot∘delta
  * merge law, and q206 against an in-memory cohort triangle with the
  * offset-0 identity.
  */
class TierSixtyOneSpec extends SparkSpec {

  import spark.implicits._

  private def opsInMemory = Tables.load(spark, sf, "events")
    .select("user_id", "event_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      math.floor(r.getDouble(3) * 100).toLong))

  test("q205 ≡ in-memory LWW fold; delete-tombstone branch live") {
    val got = TierSixtyOne.q205.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = opsInMemory.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val last = rs.maxBy(_._2)
      if (last._2 % 11 == 0) None // tombstone wins → key absent
      else Some((u, last._2, last._3, last._4))
    }.sortBy(_._1)
    assert(got == want, s"LWW fold mismatch: ${got.size} vs ${want.size}")
    val allKeys = opsInMemory.map(_._1).distinct.length
    assert(got.size < allKeys, "some key must end on a tombstone (branch live)")
  }

  test("incremental merge law: snapshot(≤cut) ∘ delta(>cut) ≡ full fold") {
    val ops = TierSixtyOne.cdcOps(Tables.load(spark, sf, "events"))
    val cut = ops.agg(expr("percentile_approx(seq, 0.5)")).collect()(0).getLong(0)
    val snapshot = TierSixtyOne.lwwMerge(ops.filter(col("seq") <= cut))
    val merged = TierSixtyOne.merge(snapshot, ops.filter(col("seq") > cut))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val full = TierSixtyOne.lwwMerge(ops).orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    assert(merged == full, "incremental merge must equal the history fold")
    // the law is non-vacuous: the delta must delete at least one key the
    // snapshot carried, and update at least one
    val snapKeys = snapshot.select("user_id").collect().map(_.getLong(0)).toSet
    val deltaOps = opsInMemory.filter(_._2 > cut)
    assert(deltaOps.exists(o => o._2 % 11 == 0 && snapKeys(o._1)),
      "delta must tombstone a snapshot key")
    assert(deltaOps.exists(o => o._2 % 11 != 0 && snapKeys(o._1)),
      "delta must update a snapshot key")
  }

  test("q206 ≡ in-memory cohort triangle; offset-0 identity; decay non-vacuous") {
    val got = TierSixtyOne.q206.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val am = Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), {
        val d = r.getAs[java.time.LocalDateTime](1)
        d.getYear.toLong * 12 + d.getMonthValue - 1
      })).distinct.toSeq
    val cohort = am.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val sizes = cohort.toSeq.groupBy(_._2).map { case (m, us) => m -> us.size.toLong }
    val want = am.groupBy(r => (cohort(r._1), r._2 - cohort(r._1)))
      .map { case ((cm, ofs), rs) =>
        (cm, ofs, rs.size.toLong, sizes(cm), rs.size.toLong * 1000000L / sizes(cm))
      }.toSeq.sortBy(r => (r._1, r._2))
    assert(got == want, s"triangle mismatch: ${got.size} vs ${want.size}")
    assert(got.filter(_._2 == 0L).forall(_._5 == 1000000L),
      "offset 0 retains the whole cohort by construction")
    assert(got.exists(r => r._5 > 0L && r._5 < 1000000L),
      "real decay must be present (probed non-degenerate)")
  }
}
