package graft

import graft.operators.{LexIndex, TierEleven}
import org.apache.spark.sql.functions._

/** The BM25 overflow dispatch: the DECIMAL(38,0) form must be
  * bit-identical to the integer form on the safe regime, exact where the
  * integer form wraps, and reachable through the one
  * `spark.graft.bm25Decimal` session pin from both the direct query and
  * the store-served probe.
  */
class Bm25DispatchSpec extends SparkSpec {

  private def withDecimal[A](body: => A): A = {
    spark.conf.set("spark.graft.bm25Decimal", "true")
    try body finally spark.conf.unset("spark.graft.bm25Decimal")
  }

  test("safe regime: decimal path ≡ integer path bit for bit (q82 + store probe)") {
    val integer = TierEleven.q82.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val decimal = withDecimal {
      TierEleven.q82.run(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(integer == decimal && integer.nonEmpty)
    val name = "lexidx_bm25d"
    LexIndex.build(
      Tables.load(spark, sf, "documents").select("doc_id", "text"), name)
    val probeInt = LexIndex.probe(spark, name, Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val probeDec = withDecimal {
      LexIndex.probe(spark, name, Seq("spark", "window", "hash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(probeInt == probeDec && probeInt == integer,
      "one dispatch, both access paths, same scored bits")
  }

  test("overflow regime: the integer form fails loudly (ANSI), the decimal form stays exact") {
    // force tf·2200·idf_ppm past 2^63: n = 10^10 docs, df = 1
    // → idf_ppm = 10^16; tf = 10^5 → product 2.2·10^24
    val tf = 100000L
    val df = 1L
    val n = 10000000000L
    val totalToks = n * 200L
    val dl = 150L
    val row = spark.sql(
      s"""SELECT CAST($tf AS BIGINT) AS tf, CAST($df AS BIGINT) AS df,
         |       CAST($dl AS BIGINT) AS dl, CAST($n AS BIGINT) AS n,
         |       CAST($totalToks AS BIGINT) AS total_toks""".stripMargin)
    // ground truth in BigInt, replicating the formula's operation order
    val idf = (BigInt(n) * 1000000) / df
    val den = BigInt(tf) * 1000 +
      (BigInt(1200) * (250 + (BigInt(750) * ((BigInt(dl) * 1000) / (totalToks / n))) / 1000)) / 1000
    val truth = (BigInt(tf) * 2200 * idf) / den
    assert(truth > BigInt(Long.MaxValue) / 4000,
      "fixture invariant: the product regime must exceed what Int64 holds through tf·2200·idf")
    val decimal = row.select(expr(TierEleven.bm25ScoreSqlDecimal).as("s"))
      .head().getLong(0)
    assert(BigInt(decimal) == truth, s"decimal path must be exact: $decimal vs $truth")
    // under ANSI (Spark 4 default) the integer form FAILS LOUDLY instead
    // of silently wrapping — the closed loop the round-6 scaladoc only
    // documented: past the envelope the job stops and the pin is the
    // remedy, never a quietly corrupt ranking
    val err = intercept[Exception] {
      row.select(expr(TierEleven.bm25ScoreSql).cast("long").as("s")).head()
    }
    assert(err.getMessage.toLowerCase.contains("overflow"),
      s"expected a long-overflow failure from the integer form, got: ${err.getMessage}")
  }
}
