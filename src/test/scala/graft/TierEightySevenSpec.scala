package graft

import graft.operators.TierEightySeven
import org.apache.spark.sql.functions._

/** Tier-87 differentials: q253 against an in-memory scaled-integer BC
  * replay (plus the identical-halves ⇒ H = 0 and disjoint-vocab ⇒ H = 1
  * laws), q254 against an independently-coded BigInt χ² replay (plus the
  * exact V = 1 diagonal law and V = 0 independence law).
  */
class TierEightySevenSpec extends SparkSpec {
  import spark.implicits._

  test("q253 Hellinger drift ≡ in-memory scaled-integer replay") {
    val tk = Tables.load(spark, sf, "documents")
      .select(col("lang"), explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("token"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cnt = tk.groupBy(identity).map { case ((l, t), xs) => (l, t, xs.length.toLong) }
    val glob = cnt.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val nl = cnt.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._3).sum }
    val n = nl.values.sum
    val expected = nl.keys.toSeq.sorted.map { l =>
      val bc = cnt.filter(_._1 == l)
        .map(c => math.floor(1e6 * math.sqrt(c._3.toDouble *
          (glob(c._2) - c._3).toDouble)).toLong).sum
      val rest = n - nl(l)
      val (b6, h6) =
        if (rest == 0) (0.0, 1.0)
        else {
          val b = bc.toDouble / (1e6 * math.sqrt(nl(l).toDouble * rest.toDouble))
          (r6(b), r6(math.sqrt(1.0 - b)))
        }
      (l, nl(l), bc, b6, h6)
    }
    val got = TierEightySeven.q253.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expected, "q253 must equal the in-memory BC replay")
    assert(got.forall(r => r._5 > 0.0 && r._5 < 1.0),
      "fixture langs must be near but not identical to the rest")
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hellingerOver laws: identical halves ⇒ H = 0 exactly; disjoint vocab ⇒ H = 1") {
    // two groups with byte-identical token multisets: every per-token term is
    // √(c·c) = c (a perfect square — floor exact), so BC = 1 and H = 0 exactly
    val same = Seq("a", "a", "b", "c").flatMap(t => Seq(("g1", t), ("g2", t)))
    val gotSame = TierEightySeven.hellingerOver(same.toDF("grp", "token"))
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(gotSame.forall(r => r._2 == 1.0 && r._3 == 0.0))
    // disjoint vocabularies: every product c·(g−c) = c·0 ⇒ BC = 0, H = 1
    val disj = Seq(("g1", "x"), ("g1", "y"), ("g2", "p"), ("g2", "q"))
    val gotDisj = TierEightySeven.hellingerOver(disj.toDF("grp", "token"))
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(gotDisj.forall(r => r._1 == 0.0 && r._2 == 1.0))
  }

  test("q254 Cramér's V ≡ independently-coded BigInt replay") {
    val rows = Tables.load(spark, sf, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val langs = rows.map(_._1).distinct.sorted
    val srcs = rows.map(_._2).distinct.sorted
    val rt = langs.map(l => l -> BigInt(rows.count(_._1 == l))).toMap
    val ct = srcs.map(s0 => s0 -> BigInt(rows.count(_._2 == s0))).toMap
    val n = BigInt(rows.length)
    var chi2 = BigInt(0)
    for (l <- langs; s0 <- srcs) {
      val o = BigInt(cells.getOrElse((l, s0), 0L))
      val d = o * n - rt(l) * ct(s0)
      chi2 += d * d * 1000000 / (rt(l) * ct(s0) * n)
    }
    val k = math.min(langs.size, srcs.size) - 1
    val v = r6(math.sqrt(chi2.toDouble / (1e6 * rows.length.toDouble * k.toDouble)))
    val got = TierEightySeven.q254.run(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((rows.length.toLong, langs.size.toLong, srcs.size.toLong, chi2.toLong)))
    assert(got.getDouble(4) == v)
    assert(got.getLong(3) > 0, "fixture must not be exactly independent")
  }

  test("chi2Ppm laws: diagonal grid ⇒ V = 1 exactly; product grid ⇒ χ² = 0") {
    // 4×4 diagonal, 25 per cell: χ²_ppm = 4·⌊10⁶·25·9/4⌋ + 12·⌊10⁶·25/4⌋ = 3·10⁸
    val diag = (0 until 4).map(i => (s"r$i", s"c$i") -> 25L).toMap
    assert(TierEightySeven.chi2Ppm(diag) == 300000000L)
    // V on that grid: √(300/(100·3)) = 1
    assert(math.sqrt(TierEightySeven.chi2Ppm(diag).toDouble / (1e6 * 100 * 3)) == 1.0)
    // exact independence: O = r·c/N for every cell ⇒ every term 0
    val prod = (for (i <- 0 until 3; j <- 0 until 4)
      yield (s"r$i", s"c$j") -> ((i + 1) * (j + 1) * 10).toLong).toMap
    assert(TierEightySeven.chi2Ppm(prod) == 0L)
  }
}
