package graft

import graft.operators.{TierSeventy, TierSeventyOne}
import org.apache.spark.sql.functions._

/** Tier-71 differentials: q225 against an in-memory gap scan, plus the
  * cross-query law — episodes are exactly the maximal zero-count runs
  * of q223's gap-filled series with length ≥ 2.
  */
class TierSeventyOneSpec extends SparkSpec {

  test("q225 ≡ in-memory gap scan; ≡ maximal zero-runs of q223's dense series") {
    val got = TierSeventyOne.q225.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ud = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = ud.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val days = rs.map(_._2).sorted
      days.zip(days.tail).collect {
        case (a, b) if b - a - 1 >= 2 => (u, a + 1, b - a - 1)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want, s"episode mismatch: ${got.take(3)} vs ${want.take(3)}")
    assert(got.nonEmpty, "episodes must exist on the fixture (probed: 7 at sf0.001)")

    // cross-law: q223's dense series has a maximal zero-run of length L
    // starting at day s exactly where q225 reports an episode (s, L)
    val dense = TierSeventy.q223.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val runs = dense.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val seq = rows.sortBy(_._2)
      val zero = seq.filter(_._3 == 0L).map(_._2)
      // fold consecutive zero days into (start, len) runs
      zero.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, l) :: t, d) if d == s0 + l => (s0, l + 1) :: t
        case (acc, d) => (d, 1L) :: acc
      }.map { case (s0, l) => (u, s0, l) }
    }.filter(_._3 >= 2).sortBy(r => (r._1, r._2))
    assert(runs == got,
      "q225 episodes must be exactly q223's interior zero-runs of length ≥ 2")
  }
}
