package graft

import graft.operators.TierSixtyThree
import org.apache.spark.sql.functions._

/** Tier-63 differentials: q209 against an in-memory net fold with the
  * incremental-maintenance law (snapshot∘delta ≡ full fold), the
  * delete-at-identity branch and the nonzero-remnant retention law
  * (both constructed — the fixture nets every key positive); q210
  * against an in-memory BigInt OLS plus exact synthetic lines.
  */
class TierSixtyThreeSpec extends SparkSpec {

  import spark.implicits._

  private def deltaInMemory = Tables.load(spark, sf, "events")
    .select("user_id", "event_id", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1),
      if (r.getLong(1) % 13 == 0) -1L else 1L,
      math.floor(r.getDouble(2) * 100).toLong))

  private def foldInMemory(rows: Seq[(Long, Long, Long, Long)]) =
    rows.groupBy(_._1).toSeq.map { case (u, rs) =>
      (u, rs.map(_._3).sum, rs.map(r => r._3 * r._4).sum)
    }.filter(r => r._2 != 0 || r._3 != 0).sortBy(_._1)

  test("q209 ≡ in-memory net fold; both multiplicity branches live") {
    val got = TierSixtyThree.q209.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val mem = deltaInMemory
    assert(got == foldInMemory(mem.toSeq), "net fold mismatch")
    assert(mem.exists(_._3 == -1L) && mem.exists(_._3 == 1L),
      "both +1 and -1 multiplicities must be live on the fixture")
  }

  test("maintain law: fold(≤cut) ∘ delta(>cut) ≡ full fold, non-vacuously") {
    val delta = TierSixtyThree.ivmDeltaOf(Tables.load(spark, sf, "events"))
    val cut = delta.agg(expr("percentile_approx(seq, 0.5)")).collect()(0).getLong(0)
    val snapshot = TierSixtyThree.ivmFold(delta.filter(col("seq") <= cut))
    val merged = TierSixtyThree.maintain(snapshot, delta.filter(col("seq") > cut))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val full = TierSixtyThree.ivmFold(delta).orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    assert(merged == full, "incremental maintenance must equal the full fold")
    val snapKeys = snapshot.select("user_id").collect().map(_.getLong(0)).toSet
    assert(deltaInMemory.exists(d => d._2 > cut && snapKeys(d._1)),
      "delta must touch a snapshot key (law non-vacuous)")
  }

  test("delete fires at the group identity; nonzero cents remnant is retained") {
    val snapshot = Seq((1L, 2L, 500L), (2L, 1L, 300L))
      .toDF("user_id", "n_net", "revenue_net_c")
    // key 1: delta exactly negates the state → IVM delete
    // key 2: delta zeroes the count but leaves +200 cents → retained
    val delta = Seq(
      (1L, 10L, -1L, 250L), (1L, 11L, -1L, 250L),
      (2L, 12L, -1L, 100L)).toDF("user_id", "seq", "m", "cents")
    val out = TierSixtyThree.maintain(snapshot, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((2L, 0L, 200L)),
      s"key 1 must be deleted at identity, key 2's remnant retained: $out")
  }

  test("q210 ≡ in-memory BigInt OLS over the daily grid") {
    val got = TierSixtyThree.q210.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val M = BigInt(1000000)
    val grid = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mind = grid.map(_._2).min
    val want = grid.groupBy(_._1).toSeq.map { case (t, rs) =>
      val pts = rs.groupBy(_._2).toSeq
        .map { case (d, hits) => (BigInt(d - mind), BigInt(hits.length)) }
      val n = BigInt(pts.size)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val vyn = n * syy - sy * sy
      val slope = M * num / den
      (t, n.toLong, slope.toLong, ((M * sy - slope * sx) / n).toLong,
        (if (vyn == 0) M else M * num * num / (den * vyn)).toLong)
    }.sortBy(_._1)
    assert(got == want, s"OLS mismatch: $got vs $want")
    assert(got.forall(_._5 < 1000000), "fixture grids are noisy — r² < 1")
  }

  test("trendFit is exact on synthetic lines") {
    // exact line y = 3x + 7 → slope 3·10⁶ ppm, intercept 7·10⁶ ppm, r² = 10⁶
    val line = (0L to 9L).map(x => ("line", x, 3 * x + 7))
      .toDF("event_type", "x", "y")
    assert(TierSixtyThree.trendFit(line) ==
      Seq(("line", 10L, 3000000L, 7000000L, 1000000L)))
    // constant series → vyn = 0 branch: slope 0, intercept = the constant, r² = 10⁶
    val const = (0L to 4L).map(x => ("const", x, 42L))
      .toDF("event_type", "x", "y")
    assert(TierSixtyThree.trendFit(const) ==
      Seq(("const", 5L, 0L, 42000000L, 1000000L)))
    // falling line → negative slope, truncating division agreed across engines
    val fall = (0L to 4L).map(x => ("fall", x, 100 - 2 * x))
      .toDF("event_type", "x", "y")
    assert(TierSixtyThree.trendFit(fall) ==
      Seq(("fall", 5L, -2000000L, 100000000L, 1000000L)))
  }

  test("trendDecimal dispatch: Int64 moment sums throw at the boundary; decimal ≡ BigInt") {
    // y ≈ 4·10⁹ daily rows ⇒ y² ≈ 1.6·10¹⁹ > Int64 — the documented
    // Σy² wrap (r11 ADVICE). ANSI mode makes the default path fail
    // LOUDLY; spark.graft.trendDecimal=true must close exactly (BigInt).
    val Y = 4000000000L
    val big = (0L to 9L).map(x => ("big", x, Y + 1000000L * x))
      .toDF("event_type", "x", "y")
    val ex = intercept[Exception] { TierSixtyThree.trendFit(big) }
    assert(ex.getMessage.toLowerCase.contains("overflow"),
      s"the Int64 moment fold must overflow loudly: ${ex.getMessage.take(200)}")
    spark.conf.set("spark.graft.trendDecimal", "true")
    try {
      val got = TierSixtyThree.trendFit(big)
      val M = BigInt(1000000)
      val pts = (0L to 9L).map(x => (BigInt(x), BigInt(Y) + BigInt(1000000L) * x))
      val n = BigInt(pts.size)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val vyn = n * syy - sy * sy
      val slope = M * num / den
      val want = Seq(("big", n.toLong, slope.toLong,
        ((M * sy - slope * sx) / n).toLong,
        (if (vyn == 0) M else M * num * num / (den * vyn)).toLong))
      assert(got == want, s"decimal path must be exact: $got vs $want")
      assert(got.head._3 == 1000000000000L, "exact line: slope 10⁶ counts/day in ppm")
    } finally spark.conf.unset("spark.graft.trendDecimal")
  }
}
