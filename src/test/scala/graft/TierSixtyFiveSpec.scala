package graft

import graft.operators.TierSixtyFive
import org.apache.spark.sql.functions._

/** Tier-65 differentials: q213's predictor proven EXACT against the
  * actual self-join count (the law that makes it a planner, not an
  * estimate), and q214's custom-plan as-of enrichment against an
  * in-memory lag fold with the first-event null branch and the native
  * AsOfJoin operator proven present in the plan.
  */
class TierSixtyFiveSpec extends SparkSpec {

  test("q213 predicted rows ≡ the actual self-join count; report ≡ in-memory") {
    val got = TierSixtyFive.q213.run(spark, sf).collect()(0)
    val li = Tables.load(spark, sf, "lineitem")
    val actual = li.select(col("l_partkey").as("k"))
      .join(li.select(col("l_partkey").as("k")), "k").count()
    assert(got.getLong(2) == actual,
      s"predictor must be exact: predicted ${got.getLong(2)} vs actual $actual")
    val counts = li.groupBy("l_partkey").count()
      .collect().map(_.getLong(1))
    val predicted = counts.map(c => BigInt(c) * BigInt(c)).sum
    val maxk = counts.map(c => BigInt(c) * BigInt(c)).max
    assert(got.getLong(0) == counts.length && got.getLong(1) == counts.sum)
    assert(got.getLong(3) == maxk.toLong)
    assert(got.getLong(4) == (BigInt(1000000) * maxk / predicted).toLong)
  }

  test("q214 ≡ in-memory lag fold; first-event null branch live; native as-of plan") {
    val enriched = TierSixtyFive.priorStateOf(spark, sf)
    // the custom Catalyst operator actually plans (not a window rewrite)
    assert(enriched.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "q214 must run through the native AsOfJoin exec")
    val got = enriched.orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val ev = Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3), math.floor(r.getDouble(4) * 100).toLong))
    def micros(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L + t.getNano / 1000L
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ordered = rs.sortBy(r => (micros(r._2), r._3))
      ordered.zipWithIndex.collect {
        case (r, i) if r._4 == "purchase" =>
          (u, r._3, r._5, if (i == 0) None else Some(ordered(i - 1)._5))
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want, s"as-of enrich mismatch: ${got.take(3)} vs ${want.take(3)}")
    assert(got.exists(_._4.isEmpty), "a first-event purchase must enrich to null")
    assert(got.exists(_._4.nonEmpty), "non-first purchases must carry prior state")
  }
}
