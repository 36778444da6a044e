package graft

import graft.operators.TierSeventy
import org.apache.spark.sql.functions._

/** Tier-70 differentials: q223 against an in-memory spine + LOCF fold
  * (both fill rules proven live — genuine gap days exist and carry the
  * previous state while counting zero); q224 against an in-memory
  * weighted-quantile fold with the mass-balance law.
  */
class TierSeventySpec extends SparkSpec {

  test("q223 ≡ in-memory spine + LOCF; gaps live, zero-fill + carried state") {
    val got = TierSeventy.q223.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val byDay = rs.groupBy(_._2).map { case (d, h) =>
        d -> (h.length.toLong, h.map(_._3).sum) }
      val (lo, hi) = (byDay.keys.min, byDay.keys.max)
      var carried = 0L
      (lo to hi).map { d =>
        byDay.get(d) match {
          case Some((n, c)) => carried = c; (u, d, n, c)
          case None => (u, d, 0L, carried)
        }
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want, s"gap-fill mismatch: ${got.take(3)} vs ${want.take(3)}")
    val gaps = got.filter(_._3 == 0L)
    assert(gaps.nonEmpty, "genuine gap days must exist on the fixture")
    assert(gaps.forall(_._4 > 0L),
      "a gap day must carry the previous state (LOCF), never zero it")
  }

  test("q224 ≡ in-memory weighted quantile; mass balance holds") {
    val got = TierSeventy.q224.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lens = Tables.load(spark, sf, "documents")
      .select(size(filter(split(col("text"), " "), x => x =!= "")).cast("long"))
      .collect().map(_.getLong(0))
    val w = lens.sum
    def lenAt(p: Long): Long = {
      var cum = 0L
      lens.sorted.find { l => cum += l; 100 * cum >= p * w }.get
    }
    assert(got == Seq((50L, lenAt(50), w), (90L, lenAt(90), w)),
      s"weighted quantile mismatch: $got")
    // mass balance: docs of length ≤ len_at_p hold ≥ p% of tokens, and
    // strictly less than p% sits below it (minimality)
    got.foreach { case (p, lp, _) =>
      val below = lens.filter(_ < lp).sum
      val upTo = lens.filter(_ <= lp).sum
      assert(100 * upTo >= p * w && 100 * below < p * w,
        s"p$p: $lp must be the MINIMAL length crossing the mass threshold")
    }
  }
}
