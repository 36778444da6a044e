package graft

import graft.operators.TierEightySix
import org.apache.spark.sql.functions._

/** Tier-86 differentials: q251 against an in-memory Mann–Kendall replay
  * (plus the strict-monotone law on a synthetic grid), q252 against an
  * in-memory pairwise τ-b replay (plus the perfect-concordance law).
  */
class TierEightySixSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mkExpected(xs: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
    // xs: (day_idx, cnt) for one type, any order
    val v = xs.sortBy(_._1).map(_._2)
    val n = v.size.toLong
    val s = (for (i <- v.indices; j <- i + 1 until v.size)
      yield java.lang.Long.signum(v(j) - v(i)).toLong).sum
    val tie = v.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie
    val z =
      if (var18 == 0 || s == 0) 0.0
      else r6((s - (if (s > 0) 1 else -1)).toDouble / math.sqrt(var18.toDouble / 18.0))
    (n, s, var18, z)
  }

  test("q251 Mann–Kendall ≡ in-memory replay on the daily grid") {
    val dc = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = dc.groupBy(_._1).map { case (et, rows) =>
      val (n, s, v, z) = mkExpected(rows.map(r => (r._2, r._3)).toSeq)
      (et, n, s, v, z)
    }.toSeq.sortBy(_._1)
    val got = TierEightySix.q251.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, "q251 must equal the in-memory Mann–Kendall replay")
    assert(got.exists(_._3 != 0L), "fixture must show a non-zero S somewhere")
  }

  test("mannKendallOver laws: strict monotone maxes S; constant grid zeroes everything") {
    val up = (0 until 12).map(i => ("a", i.toLong, (10 + i).toLong))
    val flat = (0 until 12).map(i => ("b", i.toLong, 7L))
    val g = (up ++ flat).toDF("event_type", "day_idx", "cnt")
    val got = TierEightySix.mannKendallOver(g).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val n = 12L
    val a = got.find(_._1 == "a").get
    assert(a._3 == n * (n - 1) / 2, "strict ascent ⇒ S = n(n−1)/2")
    assert(a._4 == n * (n - 1) * (2 * n + 5), "no ties ⇒ var18 = n(n−1)(2n+5)")
    assert(a._5 > 0.0)
    val b = got.find(_._1 == "b").get
    assert(b._3 == 0L && b._4 == 0L && b._5 == 0.0,
      "constant series ⇒ S = 0, var18 = 0 (all tied), z = 0")
  }

  test("q252 Kendall τ-b ≡ in-memory pairwise replay") {
    val g = Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey").as("gk"))
      .agg(sum(floor(col("c_acctbal") * 100)).as("x"), count(lit(1)).as("y"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2)))
    var c = 0L; var d = 0L
    for (i <- g.indices; j <- g.indices; if g(i)._1 < g(j)._1) {
      val (xa, ya, xb, yb) = (g(i)._2, g(i)._3, g(j)._2, g(j)._3)
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) c += 1
      else if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) d += 1
    }
    val m = g.length.toLong
    def tiePairs(vs: Seq[Long]): Long =
      vs.groupBy(identity).values.map(t => t.size.toLong * (t.size - 1) / 2).sum
    val n1 = tiePairs(g.map(_._2).toSeq)
    val n2 = tiePairs(g.map(_._3).toSeq)
    val n0 = m * (m - 1) / 2
    val tau =
      if (n0 - n1 == 0 || n0 - n2 == 0) 0.0
      else r6((c - d).toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble))
    val got = TierEightySix.q252.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).head
    assert(got == ((m, c, d, n1, n2, tau)), "q252 must equal the pairwise replay")
    assert(got._2 + got._3 > 0, "fixture must produce comparable pairs")
  }

  test("kendallTauOver laws: identity ranks ⇒ τ = 1; reversal ⇒ τ = −1; constant leg ⇒ 0") {
    val idn = (1 to 9).map(i => (i.toLong, i.toLong * 10, i.toLong * 3))
    val gotId = TierEightySix.kendallTauOver(idn.toDF("gk", "x", "y"))
      .collect().head
    assert(gotId.getDouble(5) == 1.0 && gotId.getLong(2) == 0L)
    val rev = (1 to 9).map(i => (i.toLong, i.toLong, 100L - i))
    assert(TierEightySix.kendallTauOver(rev.toDF("gk", "x", "y"))
      .collect().head.getDouble(5) == -1.0)
    val const = (1 to 9).map(i => (i.toLong, i.toLong, 5L))
    assert(TierEightySix.kendallTauOver(const.toDF("gk", "x", "y"))
      .collect().head.getDouble(5) == 0.0, "a constant margin carries no rank signal")
  }
}
