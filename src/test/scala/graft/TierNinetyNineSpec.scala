package graft

import graft.operators.TierNinetyNine
import org.apache.spark.sql.functions._

/** Tier-99 differentials: q277 against an in-memory moment replay (plus
  * the perfect-trend and flat laws), q278 against an in-driver impurity
  * replay (plus the pure-split and useless-split laws).
  */
class TierNinetyNineSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def z2Of(doses: Seq[(Long, Long, Long)]): Double = {
    val nn = doses.map(_._2).sum; val aa = doses.map(_._3).sum
    val t1 = doses.map(d => d._1 * d._3).sum
    val t2 = doses.map(d => d._1 * d._2).sum
    val t3 = doses.map(d => d._1 * d._1 * d._2).sum
    if (aa == 0 || aa == nn || nn * t3 - t2 * t2 == 0) 0.0
    else r6(nn.toDouble * (nn * t1 - aa * t2).toDouble * (nn * t1 - aa * t2).toDouble
      / ((aa * (nn - aa)).toDouble * (nn * t3 - t2 * t2).toDouble))
  }

  test("q277 ≡ in-memory moment replay; flat rates ⇒ small; perfect trend ⇒ ≈N") {
    val doses = Tables.load(spark, sf, "orders")
      .groupBy(substring(col("o_orderpriority"), 1, 1).cast("long").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = TierNinetyNine.q277.run(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1)) == ((doses.map(_._2).sum, doses.map(_._3).sum)))
    assert(got.getDouble(5) == z2Of(doses), s"z2 ${got.getDouble(5)} vs ${z2Of(doses)}")
    // the fixture's statuses are hash-uniform across priorities: no trend,
    // z² far below any significance bar (3.84 at α=.05)
    assert(got.getDouble(5) < 3.84, "uniform fixture must not flag a trend")
    // law: a monotone dose-response (10 % → 90 % linear ramp) scores far
    // above any significance bar — χ²₁ at α=.001 is 10.8
    val ramp = (1L to 5L).map(w => (w, 100L, w * 20L - 10L))
    assert(z2Of(ramp) > 100.0,
      s"a strong ramp must dominate the bar, got ${z2Of(ramp)}")
    // law: flat rate across doses is exactly 0 trend
    val flat = (1L to 5L).map(w => (w, 100L, 30L))
    assert(z2Of(flat) == 0.0)
    assert(TierNinetyNine.trendOver(flat.toDF("w", "n", "a"))
      .collect().head.getDouble(5) == 0.0)
  }

  test("q278 ≡ in-driver impurity replay; pure split ⇒ 0; useless split keeps baseline") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tokOf = docs.map { case (id, t, _) =>
      id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
    val langOf = docs.map(d => d._1 -> d._3).toMap
    val df = docs.flatMap(d => tokOf(d._1).map(_ -> 1L))
      .groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    val cands = df.toSeq.sortBy(t => (-t._2, t._1)).take(20).map(_._1)
    val n = docs.length.toLong
    def sideTerm(ids: Seq[Long]): Long = {
      val m = ids.size.toLong
      if (m == 0) 0L
      else {
        val s2 = ids.groupBy(langOf).values.map(g => g.size.toLong * g.size).sum
        (m * m - s2) * 1000000L / m
      }
    }
    val expected = cands.map { t =>
      val withT = docs.map(_._1).filter(id => tokOf(id)(t))
      val without = docs.map(_._1).filterNot(id => tokOf(id)(t))
      (t, withT.size.toLong, (sideTerm(withT) + sideTerm(without)) / n)
    }.sortBy(x => (x._3, x._1))
    val got = TierNinetyNine.q278.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"stump table mismatch: ${got.take(3)} vs ${expected.take(3)}")
    // laws through the library face
    val labels = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"))
      .toDF("doc_id", "cls")
    val tok = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"),
      (1L, "z"), (3L, "z")).toDF("doc_id", "token")
    val lawGot = TierNinetyNine.giniStumpOver(labels, tok,
        Seq("x", "z").toDF("token")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(lawGot("x") == 0L, "a class-pure split must score exactly 0")
    // z splits 50/50 across both classes: both sides stay maximally mixed
    // (Gini 1/2 each) — the weighted score is the baseline 500000
    assert(lawGot("z") == 500000L, s"useless split must keep baseline, got $lawGot")
  }
}
