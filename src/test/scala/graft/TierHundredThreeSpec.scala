package graft

import graft.operators.TierHundredThree
import org.apache.spark.sql.functions._

/** Tier-103 differentials: q285 against an in-driver Neyman+Hamilton
  * replay (plus the budget-exactness and optimality-direction laws),
  * q286 against an in-driver moment replay (plus the equal-weights and
  * degenerate laws).
  */
class TierHundredThreeSpec extends SparkSpec {
  import spark.implicits._

  test("q285 ≡ in-driver Neyman + Hamilton replay; allocations sum to the budget; higher-variance strata get more than proportional") {
    val rows = Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment"), floor(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val strata = rows.groupBy(_._1).map { case (seg, xs) =>
      val v = xs.map(_._2)
      val n = v.length.toLong
      val s = v.sum
      val q = v.map(x => x * x).sum
      val varr = (q.toDouble - s.toDouble * s.toDouble / n.toDouble) / (n.toDouble - 1.0)
      val w = if (n < 2 || varr <= 0) 0L
        else math.floor(n.toDouble * math.sqrt(varr)).toLong
      seg -> (n, w)
    }
    val tw = strata.values.map(_._2).sum
    val base = strata.map { case (seg, (_, w)) =>
      seg -> (TierHundredThree.Budget * w / tw, TierHundredThree.Budget * w % tw) }
    val leftover = TierHundredThree.Budget - base.values.map(_._1).sum
    val extras = base.toSeq.sortBy { case (seg, (_, rem)) => (-rem, seg) }
      .take(leftover.toInt).map(_._1).toSet
    val expected = strata.toSeq.sortBy(_._1).map { case (seg, (n, w)) =>
      (seg, n, w, base(seg)._1 + (if (extras(seg)) 1L else 0L))
    }
    val got = TierHundredThree.q285.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.map(_._4).sum == TierHundredThree.Budget,
      "allocations must sum to exactly the budget (the Hamilton law)")

    // optimality direction: against a synthetic two-strata frame where
    // sizes are equal but one stratum has far larger spread, Neyman gives
    // the spread the seats (proportional allocation would split 50/50)
    val tight = (0 until 100).map(i => ("tight", 1000L + (i % 3)))
    val wide = (0 until 100).map(i => ("wide", (i % 50) * 1000L))
    val w2 = TierHundredThree.neymanWeights(
      (tight ++ wide).toDF("source", "cents"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(w2("wide") > 10 * w2("tight"),
      s"the high-variance stratum must dominate the weights: $w2")
  }

  test("q286 ≡ in-driver moment replay; equal weights read ess = n, deff = 1000") {
    val rows = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, xs) =>
      val n = xs.length.toLong
      val sw = xs.map(_._2).sum
      val sw2 = xs.map(x => x._2 * x._2).sum
      val ess = if (sw2 <= 0) -1L
        else math.floor(1000.0 * (sw.toDouble * sw.toDouble) / sw2.toDouble).toLong
      val deff = if (sw <= 0) -1L
        else math.floor(1000.0 * n.toDouble * sw2.toDouble
          / (sw.toDouble * sw.toDouble)).toLong
      (k, n, sw, sw2, ess, deff)
    }
    val got = TierHundredThree.q286.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.forall(r => r._5 <= r._2 * 1000),
      "ESS can never exceed n (Cauchy–Schwarz)")

    // equal weights: ESS = n exactly, deff = 1000 exactly
    val eq = TierHundredThree.essOver(
      (0 until 7).map(i => ("k", 5L)).toDF("k", "w")).collect().head
    assert(eq.getLong(4) == 7000L && eq.getLong(5) == 1000L,
      s"equal weights must read ess_milli = 1000·n, deff_milli = 1000: $eq")
  }
}
