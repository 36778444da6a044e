package graft

import graft.operators.{Cumulative, TierOne}

/** The two-pass distributed running total equals the single-partition
  * window-function formulation row-for-row (q09's scale path). */
class CumulativeSpec extends SparkSpec {

  test("two-pass prefix-sum running count ≡ window-function running count") {
    val events = Tables.load(spark, sf, "events")
    val windowed = TierOne.q09.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
    val twoPass = Cumulative.runningCount(spark, events, partitions = 7)
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
      .sortBy(t => (t._3))
    assert(twoPass.length == windowed.length)
    assert(twoPass.toSeq == windowed.toSeq)
  }
}
