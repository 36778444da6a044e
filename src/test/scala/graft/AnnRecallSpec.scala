package graft

import graft.operators.{TierEight, TierFive, TierFour, TierNine, TierThree}
import org.apache.spark.sql.DataFrame

/** Recall gates for the ANN family — the first question a 100 TB user asks
  * of an approximate path. Measured against the exact q24 top-10 at
  * sf0.01 (fixture-deterministic: no randomness anywhere, so these are
  * exact numbers with floor-headroom, not flaky statistics): single-probe
  * LSH/IVF sit at 0.3/0.1; multi-probe (q61 flip-1-bit, q62 nprobe=4)
  * lifts them to 0.9/0.7. Floors pin 0.8/0.6.
  */
class AnnRecallSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  private def ids(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("multi-probe lifts recall vs exact top-10: LSH ≥ 0.8, IVF ≥ 0.6") {
    val exact = ids(TierThree.q24.run(spark, sf01))
    assert(exact.size == 10)
    def recall(df: DataFrame): Double = ids(df).intersect(exact).size / 10.0
    val lsh1 = recall(TierFour.q29.run(spark, sf01))
    val lsh5 = recall(TierEight.q61.run(spark, sf01))
    val ivf1 = recall(TierFive.q43.run(spark, sf01))
    val ivf4 = recall(TierEight.q62.run(spark, sf01))
    assert(lsh5 >= lsh1, s"multi-probe LSH must not lose recall: $lsh5 < $lsh1")
    assert(ivf4 >= ivf1, s"multi-probe IVF must not lose recall: $ivf4 < $ivf1")
    assert(lsh5 >= 0.8, s"LSH flip-1-bit recall $lsh5 under the 0.8 floor")
    assert(ivf4 >= 0.6, s"IVF nprobe=4 recall $ivf4 under the 0.6 floor")
  }

  test("trained-IVF probe (q70) reports its single-cell recall vs exact") {
    val exact = ids(TierThree.q24.run(spark, sf01))
    val trained = ids(TierNine.q70.run(spark, sf01)).intersect(exact).size / 10.0
    // single-cell probe of a k=4 quantizer scans ~1/4 of the corpus; the
    // measured fixture recall is informational (geometry-dependent), the
    // gate is only that the probe beats random-quarter expectation
    info(s"q70 trained-IVF single-cell recall: $trained")
    assert(trained >= 0.3, s"trained-IVF recall $trained under the 0.3 floor")
  }
}
