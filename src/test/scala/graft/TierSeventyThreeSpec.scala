package graft

import graft.operators.TierSeventyThree
import org.apache.spark.sql.functions._

/** Tier-73 differentials: q227's observed audit ≡ a direct scan with
  * the same-pass write law and the null counter fired on a
  * constructed frame; q228 against an in-memory Pareto fold with the
  * boundary laws (shares sum, class thresholds, first part is A).
  */
class TierSeventyThreeSpec extends SparkSpec {

  import spark.implicits._

  test("q227 observed metrics ≡ direct scan; same-pass write law; nulls fire") {
    val got = TierSeventyThree.q227.run(spark, sf).collect()(0)
    val want = Tables.load(spark, sf, "lineitem")
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * 100).cast("long")),
        (count(lit(1)) - count(col("l_partkey"))),
        max(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")))
      .collect()(0)
    assert((0 to 3).forall(i => got.getLong(i) == want.getLong(i)),
      s"observed audit must equal the direct scan: $got vs $want")
    assert(got.getLong(2) == 0L, "driver tables are constraint-clean: honest zero")

    // the operator is genuinely CollectMetrics, and the null counter works:
    // a constructed frame with nulls, observed through the same path
    val dir = graft.sources.Warehouse.scratchDir("graft_wap_spec")
    val df = Seq((1L, Some(10L), 100.0, "2024-01-01 00:00:00"),
        (2L, None, 50.0, "2024-01-02 00:00:00"))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp_ntz"))
    val (n, rev, nulls, maxd) =
      TierSeventyThree.observedWrite(spark, df, s"$dir/shards")
    assert((n, rev, nulls) == (2L, 15000L, 1L),
      s"constructed nulls must fire the audit counter: ($n, $rev, $nulls)")
    assert(maxd == java.time.LocalDate.parse("2024-01-02").toEpochDay)
    // one pass: the written store holds exactly the audited rows
    assert(spark.read.parquet(s"$dir/shards").count() == n,
      "the audit must describe exactly what was written (same pass)")
  }

  test("q228 ≡ in-memory Pareto fold; boundary laws") {
    val got = TierSeventyThree.q228.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val pr = Tables.load(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = pr.map(_._2).sum
    var cum = 0L
    val classed = pr.sortBy(r => (-r._2, r._1)).map { case (k, r) =>
      val c = if (cum * 10 < w * 7) "A" else if (cum * 10 < w * 9) "B" else "C"
      cum += r
      (k, r, c)
    }
    val want = classed.groupBy(_._3).toSeq.map { case (c, rs) =>
      val rev = rs.map(_._2).sum
      (c, rs.length.toLong, rev, 1000000L * rev / w)
    }.sortBy(_._1)
    assert(got == want, s"Pareto mismatch: $got vs $want")
    assert(got.map(_._1) == Seq("A", "B", "C"), "all three classes live")
    assert(got.map(_._3).sum == w, "class revenues must partition the total")
    assert(classed.head._3 == "A", "the top part is always class A")
    // A's exclusive boundary: its revenue share is ≥ 70% only after
    // including the crossing part — cum share of A ≥ 70% of the total
    val aRev = got.find(_._1 == "A").get._3
    assert(aRev * 10 >= w * 7, "class A must complete the 70% band")
  }
}
