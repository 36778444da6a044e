package graft

import graft.operators.TierNinetyTwo
import org.apache.spark.sql.functions._

/** Tier-92 differentials: q263 against an in-memory lag fold (plus the
  * perfect-weekly and constant-series laws), q264 against an in-memory
  * per-user replay (plus the censoring-shrinks-at-risk and
  * events-bounded-by-at-risk closures).
  */
class TierNinetyTwoSpec extends SparkSpec {
  import spark.implicits._

  test("q263 MASE backtest ≡ in-memory lag fold") {
    val dc = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = dc.groupBy(_._1).map { case (et, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      val evals = m.keys.filter(d => m.contains(d - 1) && m.contains(d - 7)).toSeq
      val saeS = evals.map(d => math.abs(m(d) - m(d - 7))).sum
      val saeN = evals.map(d => math.abs(m(d) - m(d - 1))).sum
      (et, evals.size.toLong, saeS, saeN,
        if (saeN == 0) 1000000L else 1000000L * saeS / saeN)
    }.toSeq.sortBy(_._1)
    val got = TierNinetyTwo.q263.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, "q263 must equal the in-memory lag fold")
    assert(got.map(_._5).distinct.size > 1, "types must discriminate")
  }

  test("maseOver laws: exact weekly cycle ⇒ 0; constant series ⇒ declared 10⁶") {
    val weekly = (0 until 28).map(i => ("w", i.toLong, (10 + i % 7).toLong))
    val flat = (0 until 28).map(i => ("f", i.toLong, 9L))
    val got = TierNinetyTwo.maseOver(
        (weekly ++ flat).toDF("event_type", "day_idx", "cnt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(got("w") == ((0L, 0L)),
      "a perfect weekly cycle has zero seasonal error ⇒ mase 0")
    assert(got("f") == ((0L, 1000000L)),
      "a constant series ties both forecasts at zero ⇒ declared 10⁶")
  }

  test("q264 hazard table ≡ in-memory per-user replay") {
    val e = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val horizon = e.map(_._3).max
    val signup = e.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val firstGoal = signup.flatMap { case (u, s0) =>
      e.filter(x => x._1 == u && x._2 == "purchase" && x._3 >= s0)
        .map(_._3).minOption.map(p => u -> (p - s0))
    }
    val expected = (0L until TierNinetyTwo.HazardDays).flatMap { d =>
      val atRisk = signup.count { case (u, s0) =>
        firstGoal.get(u).forall(_ >= d) && horizon - s0 >= d }.toLong
      val ev = firstGoal.values.count(_ == d).toLong
      if (atRisk > 0) Some((d, atRisk, ev, 1000000L * ev / atRisk)) else None
    }
    val got = TierNinetyTwo.q264.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "q264 must equal the per-user replay")
    assert(got.forall(r => r._3 <= r._2), "events never exceed the risk set")
    assert(got.map(_._2) == got.map(_._2).sorted.reverse,
      "the risk set is non-increasing in d (conversions + censoring only leave)")
    assert(got.exists(_._3 > 0), "the fixture must convert somewhere")
  }
}
