package graft

import graft.operators.TierSeventyFour
import org.apache.spark.sql.functions._

/** Tier-74 differentials: q229 against an in-memory Kish fold, with the
  * uniform-weights identity (ESS = n exactly) and the whale-collapse
  * law proven on constructed frames.
  */
class TierSeventyFourSpec extends SparkSpec {

  import spark.implicits._

  test("q229 ≡ in-memory Kish ESS; per-source + corpus rows") {
    val got = TierSeventyFour.q229.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val dw = Tables.load(spark, sf, "documents")
      .select(col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def ess(ws: Seq[Long]): Long = {
      val sw = ws.map(BigInt(_)).sum
      val sww = ws.map(w => BigInt(w) * w).sum
      (BigInt(1000000) * sw * sw / (BigInt(ws.size) * sww)).toLong
    }
    val want = (dw.groupBy(_._1).toSeq.map { case (s0, rs) =>
      (s0, rs.length.toLong, rs.map(_._2).sum, ess(rs.map(_._2).toSeq))
    } :+ ("(all)", dw.length.toLong, dw.map(_._2).sum, ess(dw.map(_._2).toSeq)))
      .sortBy(_._1)
    assert(got == want, s"ESS mismatch: ${got.take(3)} vs ${want.take(3)}")
    assert(got.forall(r => r._4 > 0 && r._4 <= 1000000L),
      "ESS/n is a (0, 1] fraction in ppm")

    // uniform weights → ESS = n exactly (the Kish identity)
    val uni = (1L to 100L).map(i => ("u", 7L)).toDF("grp", "w")
    val u = TierSeventyFour.essReport(uni).collect()(0)
    assert(u.getLong(3) == 1000000L, "uniform weights must give ESS = n")
    // one whale among ones → ESS collapses (whale dominates Σw²)
    val whale = ((1L to 99L).map(_ => ("w", 1L)) :+ (("w", 100000L)))
      .toDF("grp", "w")
    val wrow = TierSeventyFour.essReport(whale).collect()(0)
    assert(wrow.getLong(3) < 20000L,
      s"a whale weight must collapse ESS (got ${wrow.getLong(3)} ppm)")
  }
}
