package graft

import graft.operators.TierHundredFive
import org.apache.spark.sql.functions._

/** Tier-105 differentials: q289 against an in-driver rank replay (plus
  * the no-difference-zero and known-permutation laws), q290 against an
  * in-driver first-appearance replay (plus monotonicity and the total
  * law: cum at decile 9 = distinct vocabulary).
  */
class TierHundredFiveSpec extends SparkSpec {
  import spark.implicits._

  private def friedmanExpected(rows: Seq[(String, String, Long)])
      : (Long, Long, Long, Long) = {
    val k = rows.map(_._2).distinct.size
    val byBlk = rows.groupBy(_._1).filter(_._2.size == k)
    val r2 = byBlk.toSeq.flatMap { case (_, xs) =>
      xs.map { case (_, t, v) =>
        t -> (2L * xs.count(_._3 < v) + xs.count(_._3 == v) + 1L) }
    }
    val r2j = r2.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }.toSeq
    val n = byBlk.size.toLong
    val s = r2j.map(x => x * x).sum
    val stat = if (n == 0 || k < 2) -1L
      else (1000L * (3L * s - 3L * n * n * k * (k + 1) * (k + 1))) /
        (n * k * (k + 1))
    (n, k.toLong, s, stat)
  }

  test("q289 ≡ in-driver rank replay; identical treatments read 0; a dominant treatment reads the known maximum") {
    val rows = Tables.load(spark, sf, "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("blk"),
        col("event_type").as("trt"))
      .agg(count(lit(1)).as("v"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSeq
    val expected = friedmanExpected(rows)
    val got = TierHundredFive.q289.run(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == expected, s"got $got expected $expected")
    assert(got.getLong(0) > 0, "fixture must have complete blocks")

    // identical values in every block → all ranks tie → statistic 0
    val flat = (for (b <- 0 until 4; t <- Seq("a", "b", "c"))
      yield (s"b$b", t, 7L)).toDF("blk", "trt", "v")
    assert(TierHundredFive.friedmanOver(flat).collect().head.getLong(3) == 0L,
      "no treatment difference must read exactly 0")

    // a strict ordering a < b < c in every block → the distribution-free
    // maximum n·k... for k=3: stat = n(k-1) when rankings are unanimous
    val ordered = (for (b <- 0 until 4; (t, v) <- Seq(("a", 1L), ("b", 2L), ("c", 3L)))
      yield (s"b$b", t, v + b * 10)).toDF("blk", "trt", "v")
    val gotMax = TierHundredFive.friedmanOver(ordered).collect().head.getLong(3)
    assert(gotMax == 4000L * (3 - 1),
      s"unanimous rankings must read n·(k−1) = 8.000: $gotMax")
  }

  test("q290 ≡ in-driver first-appearance replay; cumulative curve is monotone and totals the vocabulary") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        r.getLong(0) -> (if (toks.length < 2) Array.empty[String]
          else toks.sliding(2).map(_.mkString(" ")).toArray)
      }.filter(_._2.nonEmpty)
    val mx = docs.map(_._1).max
    val firstDoc = docs.sortBy(_._1)
      .flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).min }
    val byDec = firstDoc.values.groupBy(d => d * 10 / (mx + 1))
      .map { case (d, xs) => d -> xs.size.toLong }
    val expected = byDec.keys.toSeq.sorted.map { d =>
      (d, byDec(d), byDec.filter(_._1 <= d).values.sum) }
    val got = TierHundredFive.q290.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.map(_._3) == got.map(_._3).sorted, "cumulative curve must be monotone")
    assert(got.last._3 == firstDoc.size.toLong,
      "the curve must end at the full distinct vocabulary")
  }
}
