package graft

import graft.operators.TierEightyNine
import org.apache.spark.sql.functions._

/** Tier-89 differentials: q257 against an in-memory vowel-group replay,
  * q258 against an in-memory Hamilton apportionment replay plus the
  * exact-total and exact-proportionality laws.
  */
class TierEightyNineSpec extends SparkSpec {
  import spark.implicits._

  test("q257 FORCAST grade ≡ in-memory vowel-group replay") {
    val rows = Tables.load(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val re = "[aeiou]+".r
    val toks = rows.flatMap { case (src, id, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (src, id, t)) }
    val expected = toks.groupBy(_._1).map { case (src, xs) =>
      val w = xs.length.toLong
      val m = xs.count(t => re.findAllIn(t._3).size == 1).toLong
      (src, xs.map(_._2).distinct.length.toLong, w, m,
        1000000L * m / w, 20000L - 15000L * m / w)
    }.toSeq.sortBy(_._1)
    val got = TierEightyNine.q257.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, "q257 must equal the in-memory replay")
    assert(got.forall(r => r._6 >= 5000L && r._6 <= 20000L),
      "FORCAST milli-grade lives in [5000, 20000] by construction")
    assert(got.map(_._6).distinct.size > 1, "sources must differ on the fixture")
  }

  test("q258 apportionment ≡ in-memory Hamilton replay; Σseats exact") {
    val w = Tables.load(spark, sf, "documents")
      .groupBy("source").agg(sum("n_chars").as("w")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tw = w.map(_._2).sum
    val s0 = TierEightyNine.Seats
    val base = w.map { case (src, wi) => (src, wi, s0 * wi / tw, s0 * wi % tw) }
    val left = s0 - base.map(_._3).sum
    val ranked = base.sortBy(t => (-t._4, t._1)).zipWithIndex
      .map { case ((src, wi, b, _), i) =>
        val extra = if (i < left) 1L else 0L
        (src, wi, b, extra, b + extra)
      }.sortBy(_._1)
    val got = TierEightyNine.q258.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == ranked.toSeq, "q258 must equal the Hamilton replay")
    assert(got.map(_._5).sum == s0, "the apportionment must total exactly Seats")
    assert(got.exists(_._4 == 1L) && got.exists(_._4 == 0L),
      "the fixture must exercise both remainder outcomes")
  }

  test("allocate laws: exact-proportional weights need no extras; ties break by source") {
    val exact = Seq(("a", 3L), ("b", 2L), ("c", 5L)).toDF("source", "w")
    val gotExact = TierEightyNine.allocate(exact, 10L).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(gotExact.forall(_._2 == 0L), "zero remainders ⇒ zero extras")
    assert(gotExact.map(_._3).toSeq == Seq(3L, 2L, 5L))
    val tie = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("source", "w")
    val gotTie = TierEightyNine.allocate(tie, 10L).collect()
      .map(r => (r.getString(0), r.getLong(4))).toMap
    assert(gotTie == Map("x" -> 4L, "y" -> 3L, "z" -> 3L),
      "equal remainders must break ties by source ascending")
  }
}
