package graft

import graft.operators.TierNinetyThree
import org.apache.spark.sql.functions._

/** Tier-93 differentials: q265 against the shared-fold identity laws
  * (identical lists saturate, disjoint lists zero, weights are the
  * geometric table) and an independent overlap recount; q266 against an
  * exact-rational BigDecimal recompute plus the perfect-first-hit and
  * all-irrelevant laws.
  */
class TierNinetyThreeSpec extends SparkSpec {

  test("q265 RBO ≡ independent overlap recount; weight table sanity") {
    val (bm, tq) = TierNinetyThree.rankLists(spark, sf)
    val got = TierNinetyThree.q265.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // independent recount of X_d from the two collected lists
    for (((d, xd, term, _), i) <- got.zipWithIndex) {
      val expectX = bm.take(d.toInt).toSet.intersect(tq.take(d.toInt).toSet).size
      assert(xd == expectX.toLong, s"depth $d overlap")
      assert(term == TierNinetyThree.RboW(i) * xd / d)
    }
    assert(got.last._4 == got.map(_._3).sum, "cumulative closes the terms")
    // the ppb weight table is the geometric sequence, strictly decreasing
    assert(TierNinetyThree.RboW.head == 100000000L)
    assert(TierNinetyThree.RboW == TierNinetyThree.RboW.sorted.reverse)
    // at sf0.001 the two top-10s are fully disjoint (RBO = 0 — a valid,
    // meaningful reading); partial agreement is exercised by the sf0.01
    // oracle (X₄ = 1 there) and the saturation law below
    assert(got.head._2 < 1, "rankers must not agree at depth 1 on any fixture")
  }

  test("rboRows laws: identical lists saturate; disjoint lists zero") {
    val ids = (1L to 10L).toSeq
    val same = TierNinetyThree.rboRows(ids, ids)
    assert(same.map(_._2) == (1L to 10L), "identical prefixes overlap fully")
    assert(same.last._4 == TierNinetyThree.RboW.sum,
      "full agreement ⇒ RBO = Σ weights exactly (X_d = d cancels /d)")
    val disj = TierNinetyThree.rboRows(ids, (11L to 20L).toSeq)
    assert(disj.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
  }

  test("q266 ERR ≡ exact-rational recompute") {
    val got = TierNinetyThree.q266.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // recompute each term as an exact BigInt rational from the emitted grades
    var pnum = BigInt(1)
    for ((pos, _, g, term, _) <- got) {
      val rnum = (1L << math.min(g, 4L)) - 1
      val den = BigInt(16).pow(pos.toInt) * pos
      assert(term == (BigInt(1000000000L) * rnum * pnum / den).toLong,
        s"rank $pos term")
      pnum *= (16 - rnum)
    }
    assert(got.last._5 == got.map(_._4).sum)
    assert(got.exists(_._3 >= 2), "fixture must carry a graded (>1) hit")
  }

  test("errRows laws: perfect first hit dominates; all-irrelevant is zero") {
    val perfect = TierNinetyThree.errRows(Seq(1L, 2L), Map(1L -> 4L, 2L -> 4L))
    // R₁ = 15/16 ⇒ term₁ = 10⁹·15/16; the second term carries the 1/16 shadow
    assert(perfect.head._4 == 1000000000L * 15 / 16)
    assert(perfect(1)._4 == BigInt(1000000000L) * 15 * 1 / (BigInt(256) * 2)
      .toLong)
    val dead = TierNinetyThree.errRows((1L to 5L).toSeq, Map.empty)
    assert(dead.forall(r => r._4 == 0L && r._5 == 0L))
  }
}
