package graft

import graft.operators.TierNinetySix
import org.apache.spark.sql.functions._

/** Tier-96 differentials: q271 against an in-driver Wagner–Fischer
  * replay (plus the blocking-policy law), q272 against an in-memory
  * moment replay (plus the sign and degenerate laws).
  */
class TierNinetySixSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q271 ≡ in-driver Wagner–Fischer over the same blocked pairs") {
    val names = Tables.load(spark, sf, "customer")
      .select("c_name").collect().map(_.getString(0))
    val byBlock = names.groupBy(_.take(16))
    val expected = byBlock.values.toSeq.flatMap { block =>
      block.toSeq.flatMap(a => block.toSeq
        .filter(b => a < b && lev(a, b) <= 2).map(b => lev(a, b)))
    }.groupBy(identity).map { case (d, ds) => d.toLong -> ds.size.toLong }
    val got = TierNinetySix.q271.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.keySet == Set(1L, 2L),
      "fixture must exercise both edit distances (names are unique — no 0)")
  }

  test("editBlockedOver: blocking policy — cross-block typo pairs are invisible by design") {
    // "ab" vs "zb" are distance 1 but in different blocks: the candidate
    // join must not see them (recall is the BLOCK KEY's policy, the
    // documented ER tradeoff), while in-block pairs verify exactly
    val ks = Seq(("x", "abcd"), ("x", "abce"), ("x", "abzz"),
      ("y", "abcf")).toDF("k", "s")
    val got = TierNinetySix.editBlockedOver(ks, maxDist = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // in-block: (abcd,abce)=1, (abcd,abzz)=2, (abce,abzz)=2; abcf is
    // distance 1 from abcd but blocked away
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("editBlockedOver: in-block pairs beyond maxDist are excluded (thresholded-DP −1 path)") {
    // the r15 thresholded levenshtein returns −1 past maxDist; the
    // fixture's customer blocks never exceed dist 2 (only the last two
    // name chars vary), so this pins the exclusion explicitly: one block
    // holding a dist-1 pair AND a dist-4 pair must report only the former
    val ks = Seq(("x", "aaaa"), ("x", "aaab"), ("x", "zzzz")).toDF("k", "s")
    val got = TierNinetySix.editBlockedOver(ks, maxDist = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L), s"got $got")
  }

  test("q272 ≡ in-memory moment replay; arm swap negates d; constant arms declare 0") {
    // the q166/q194 arm frame, replayed with its literal hash (the
    // TierFiftyFiveSpec convention — the constants are the contract)
    val ev = Tables.load(spark, sf, "events")
    val um = ev.select("user_id").distinct()
      .withColumn("arm",
        expr("((user_id % 2147483647) * 2654435761 + 40503) % 2147483647 % 2"))
      .join(ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(sum(floor(col("value") * 100)).as("c")),
        Seq("user_id"), "left")
      .select(col("arm"), coalesce(col("c"), lit(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dOf(rows: Seq[(Long, Long)]): Double = {
      val a = rows.filter(_._1 == 0).map(_._2)
      val b = rows.filter(_._1 == 1).map(_._2)
      val (na, nb) = (a.size.toDouble, b.size.toDouble)
      val (sa, sb) = (a.sum.toDouble, b.sum.toDouble)
      val qa = a.map(x => x.toDouble * x).sum
      val qb = b.map(x => x.toDouble * x).sum
      val ss = (qa - sa * sa / na) + (qb - sb * sb / nb)
      if (ss <= 0) 0.0
      else BigDecimal((sb / nb - sa / na) / math.sqrt(ss / (na + nb - 2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TierNinetySix.q272.run(spark, sf).collect().head
    assert(got.getLong(0) == um.count(_._1 == 0) &&
      got.getLong(1) == um.count(_._1 == 1))
    assert(math.abs(got.getDouble(4) - dOf(um.toSeq)) < 1e-9,
      s"d mismatch: ${got.getDouble(4)} vs ${dOf(um.toSeq)}")
    // sign law: swapping the arm labels negates d exactly
    val swapped = um.map { case (a, c) => (1L - a, c) }
    assert(math.abs(dOf(um.toSeq) + dOf(swapped.toSeq)) < 1e-9)
    // degenerate law through the library face: constant equal arms → 0
    val const = Seq((0L, 5L), (0L, 5L), (1L, 5L), (1L, 5L)).toDF("arm", "cents")
    assert(TierNinetySix.cohenDOver(const).collect().head.getDouble(4) == 0.0,
      "zero pooled variance must DECLARE d = 0")
  }
}
