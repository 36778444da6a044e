package graft

import graft.operators.{TierSixtyEight, TierThirtyEight, TierNine}
import org.apache.spark.sql.functions._

/** Tier-68 differentials: q219's mergeability law (day→week register
  * rollup ≡ sketching the week directly, BIT for bit — the property
  * that makes a sketch store correct), q220's exact column ≡ q160's
  * declared answer (cross-query law) with the estimate gated inside
  * raw-HLL's m=64 error envelope.
  */
class TierSixtyEightSpec extends SparkSpec {

  test("q219 rollup registers ≡ direct week registers (mergeability, bit for bit)") {
    val ev = Tables.load(spark, sf, "events")
    val rolled = TierSixtyEight.dayRegisters(ev)
      .groupBy(expr("day div 7").as("week"), col("bucket"))
      .agg(max("reg").as("reg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val direct = TierNine.hllWithH(
        ev.select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 div 7")
            .as("week")), col("user_id"))
      .groupBy(col("week"), TierNine.hllBucket.as("bucket"))
      .agg(max(TierNine.hllRho).as("reg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(rolled == direct, "max-merge of day sketches must equal direct sketches")
    assert(rolled.map(_._1).distinct.size > 1, "multiple weeks on the fixture")
  }

  test("q220 n_true ≡ q160's exact rolling distinct; envelope on a high-n frame") {
    val got = TierSixtyEight.q220.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    val exact = TierThirtyEight.q160.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(t => (t._1, t._2)) == exact,
      "the verification column must equal q160's declared exact answer")
    assert(got.nonEmpty)
    // (window VARIETY is asserted on the constructed frame below — the
    // sf0.001 events fixture has every user active every day, the same
    // documented degeneracy that sent q206 to the orders table)

    // the high-n regime (raw-HLL branch) is gated on a constructed frame
    // with n ≫ m: 3000 users/day, where the squared-affine hash measured
    // ~12% at n=1500; the small-range regime gets its own LC test below
    import spark.implicits._
    val big = (0 until 10).flatMap { d =>
      (1L to 3000L).map(u => (u * 7L + d, // distinct id sets per day
        java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 3, 1, 0, 0).plusDays(d))))
    }.toDF("user_id", "ts")
    val hi = TierSixtyEight.rollingActiveHll(big).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(hi.nonEmpty && hi.map(_._2).distinct.size > 1,
      "ramp-up windows must vary on the constructed frame")
    hi.foreach { case (d, nt, est) =>
      assert(nt >= 3000 && math.abs(est - nt) <= 0.4 * nt,
        s"day $d: estimate $est outside the raw-HLL envelope of exact $nt")
    }
  }

  test("small-range regime: LC branch fires and lands near n_true (both regimes law-pinned)") {
    // r11 VERDICT #6: raw registers overestimated ~3.5× at n ≈ 15 — the
    // HLL++ linear-counting branch must now (a) actually fire at small n,
    // (b) report ≈ n_true (LC is near-exact at load n/m ≪ 1), and
    // (c) leave the high-n branch alone (the previous test's envelope).
    import spark.implicits._
    val small = (0 until 3).flatMap { d =>
      (1L to 15L).map(u => (u * 131L + d * 7L,
        java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 5, 1, 0, 0).plusDays(d))))
    }.toDF("user_id", "ts")
    val got = TierSixtyEight.rollingActiveHll(small).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(got.nonEmpty)
    val lcByV = TierSixtyEight.LcEst.toMap
    got.foreach { case (d, nt, est) =>
      // small-range: the estimate must BE one of the LC table's literals
      // (the branch fired — a raw readout at n ≈ 15–45 sits far off it)
      assert(lcByV.values.exists(v => v == est),
        s"day $d: estimate $est is not an LC table value — branch did not fire")
      assert(math.abs(est - nt) <= 0.25 * nt + 1.0,
        s"day $d: LC estimate $est too far from exact $nt")
    }
  }
}
