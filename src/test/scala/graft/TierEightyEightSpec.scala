package graft

import graft.operators.{TierEightyEight, TierFour, TierThree}
import org.apache.spark.sql.functions._

/** Tier-88 differentials: q255 against the two queries it audits — the
  * truth count must equal q23's exact pair count and the caught count
  * must equal q26's verified pair count (candidates ∩ truth IS what q26
  * ships) — plus the ratio closures; q256 against an in-memory BigInt
  * replay plus the parallel-trends and injected-uplift laws.
  */
class TierEightyEightSpec extends SparkSpec {
  import spark.implicits._

  test("q255 audit ≡ the queries it audits: n_true = |q23|, n_caught = |q26|; ratios close") {
    val got = TierEightyEight.q255.run(spark, sf).collect().head
    val (nDocs, nTrue, nCand, nCaught) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    val q23n = TierThree.q23.run(spark, sf).count()
    spark.catalog.clearCache()
    val q26n = TierFour.q26.run(spark, sf).count()
    spark.catalog.clearCache()
    assert(nTrue == q23n, "truth must be exactly q23's Jaccard ≥ 0.6 pair set")
    assert(nCaught == q26n,
      "caught must be exactly q26's verified output (candidates ∩ truth)")
    assert(nCaught <= math.min(nTrue, nCand) && nCand <= nDocs * (nDocs - 1) / 2)
    assert(got.getLong(4) == 1000000L * nCaught / nTrue)
    assert(got.getLong(5) == 1000000L * nCaught / nCand)
    val n0 = nDocs * (nDocs - 1) / 2
    assert(got.getLong(6) == (n0 - nCand) * 1000000L / n0)
    assert(nCaught < nTrue, "fixture must exhibit real LSH recall loss")
  }

  test("q256 DiD ≡ in-memory BigInt replay") {
    val rows = Tables.load(spark, sf, "events")
      .select((col("user_id") % 2).cast("int").as("t"),
        when(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
          >= TierEightyEight.PostDay, 1).otherwise(0).as("p"),
        floor(col("value") * 1000000).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val cells = rows.groupBy(r => (r._1, r._2))
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }
    def m(t: Int, p: Int) = cells.getOrElse((t, p), (0L, 0L))
    val den = BigInt(m(1, 1)._1) * m(1, 0)._1 * m(0, 1)._1 * m(0, 0)._1
    val num = BigInt(m(1, 1)._2) * m(1, 0)._1 * m(0, 1)._1 * m(0, 0)._1 -
      BigInt(m(1, 0)._2) * m(1, 1)._1 * m(0, 1)._1 * m(0, 0)._1 -
      BigInt(m(0, 1)._2) * m(1, 1)._1 * m(1, 0)._1 * m(0, 0)._1 +
      BigInt(m(0, 0)._2) * m(1, 1)._1 * m(1, 0)._1 * m(0, 1)._1
    val got = TierEightyEight.q256.run(spark, sf).collect().head
    assert(got.getLong(0) == m(1, 0)._1 && got.getLong(1) == m(1, 1)._1 &&
      got.getLong(2) == m(0, 0)._1 && got.getLong(3) == m(0, 1)._1)
    assert(got.getLong(4) == m(1, 0)._2 / m(1, 0)._1)
    assert(got.getLong(8) == (num / den).toLong,
      "q256 must equal the exact rational DiD")
  }

  test("didMicro laws: parallel trends ⇒ 0; injected uplift recovered exactly") {
    // parallel trends: both groups shift +7 micro-units post
    val par = Map((1, 0) -> (10L, 100L), (1, 1) -> (10L, 170L),
      (0, 0) -> (20L, 300L), (0, 1) -> (20L, 440L))
    assert(TierEightyEight.didMicro(par) == 0L)
    // uplift: treatment shifts +12, control flat ⇒ DiD = +12 exactly
    val up = Map((1, 0) -> (5L, 50L), (1, 1) -> (5L, 110L),
      (0, 0) -> (8L, 80L), (0, 1) -> (8L, 80L))
    assert(TierEightyEight.didMicro(up) == 12L)
    // an empty cell reads no contrast
    assert(TierEightyEight.didMicro(up - ((0, 1))) == 0L)
  }
}
