package graft

import graft.operators.TierSeventyTwo
import org.apache.spark.sql.functions._

/** Tier-72 differentials: q226 against an in-memory segment fold with
  * conservation laws — segments partition the users, cells sum to the
  * pooled q166-style table — plus per-cell recounts.
  */
class TierSeventyTwoSpec extends SparkSpec {

  private val (a0, b0, p) = (2654435761L, 40503L, 2147483647L)

  test("q226 ≡ in-memory segment fold; segments partition users; cells conserve") {
    val got = TierSeventyTwo.q226.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"),
        col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val m = ev.map(_._2).min
    val pre = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.count(_._2 < m + 15).toLong }
    val n = pre.size.toLong
    val seg = pre.toSeq.sortBy { case (u, pn) => (pn, u) }.zipWithIndex
      .map { case ((u, _), i) => u -> (i.toLong * 3 / n) }.toMap
    val conv = ev.filter(r => r._3 == "purchase" && r._4 >= 20000L &&
      r._2 >= m + 15).map(_._1).toSet
    val want = (0L to 2L).map { sg =>
      val users = seg.filter(_._2 == sg).keys.toSeq
      val (ua, ub) = users.partition(u => ((u % p) * a0 + b0) % p % 2 == 0L)
      val (ca, cb) = (ua.count(conv).toLong, ub.count(conv).toLong)
      val (na, nb) = (ua.size.toLong, ub.size.toLong)
      val det = BigInt(ca) * (nb - cb) - BigInt(cb) * (na - ca)
      val sig = if (BigInt(100) * (na + nb) * det * det >
        BigInt(384) * (ca + cb) * (na - ca + nb - cb) * na * nb) 1L else 0L
      (sg, na, nb, ca, cb, 1000000L * cb / nb - 1000000L * ca / na, sig)
    }
    assert(got == want, s"HTE mismatch: $got vs $want")
    // conservation: the three segments partition the user set and the
    // pooled cells are the column sums
    assert(got.map(r => r._2 + r._3).sum == n, "segments must partition users")
    assert(got.map(_._4).sum == seg.keys.count(u =>
      conv(u) && ((u % p) * a0 + b0) % p % 2 == 0L),
      "segment conversions must sum to the pooled arm-A conversions")
    assert(got.map(_._2).min > 0 && got.map(_._3).min > 0,
      "every segment must hold users of both arms (fixture non-degenerate)")
  }
}
