package graft

import graft.operators.TierSixtyFour
import org.apache.spark.sql.functions._

/** Tier-64 differentials: q211 against an in-memory TF-IDF top-3 fold
  * (pinned tie-break), q212's melt ∘ pivot ≡ id roundtrip law on a
  * constructed frame with an EMPTY cell (the zero-drop branch the
  * all-cells-populated fixture can't exercise).
  */
class TierSixtyFourSpec extends SparkSpec {

  import spark.implicits._

  test("q211 ≡ in-memory TF-IDF top-3; pinned tie-break") {
    val got = TierSixtyFour.q211.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val n = docs.length.toLong
    val df = docs.flatMap { case (d, ts) => ts.distinct.map(t => (t, d)) }
      .groupBy(_._1).map { case (t, rs) => t -> rs.length.toLong }
    val want = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).toSeq.map { case (t, hits) =>
        val tf = hits.length.toLong
        (d, t, tf, df(t), tf * (1000000L * n / df(t)))
      }.sortBy(r => (-r._5, r._2)).take(3).zipWithIndex
        .map { case (r, i) => (d, i + 1L, r._2, r._3, r._4, r._5) }
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(got == want, s"TF-IDF mismatch: ${got.take(4)} vs ${want.take(4)}")
    assert(got.map(_._3).distinct.size > 3,
      "keywords must vary across documents (fixture non-degenerate)")
  }

  test("q212 roundtrip law: melt ∘ pivot ≡ id, including an empty cell") {
    // hour 1 has no 'error' events — the pivot zero-fills that cell and
    // the melt must drop it, reproducing the long form exactly
    val long = Seq(
      (0L, "click", 2L), (0L, "error", 1L), (0L, "purchase", 1L),
      (0L, "signup", 1L), (0L, "view", 3L),
      (1L, "click", 1L), (1L, "purchase", 2L), (1L, "signup", 1L),
      (1L, "view", 1L))
      .toDF("hour", "event_type", "n_events")
    val types = TierSixtyFour.PivotTypes
    val wide = long.groupBy("hour").pivot("event_type", types)
      .agg(coalesce(sum("n_events"), lit(0L)))
      .na.fill(0L, types)
    val melted = TierSixtyFour.melt(wide)
      .orderBy("hour", "event_type").collect().map(_.toSeq).toSeq
    assert(melted == long.orderBy("hour", "event_type").collect().map(_.toSeq).toSeq,
      "melt(pivot(x)) must equal x with the empty cell dropped")
    assert(wide.filter(col("hour") === 1L).select("error").collect()
      .head.getLong(0) == 0L, "the constructed empty cell must exist")
  }
}
