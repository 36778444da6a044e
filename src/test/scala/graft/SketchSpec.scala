package graft

import graft.functions.Sketches
import graft.operators.TierTwo
import org.apache.spark.sql.functions._

/** Sketch aggregates: tolerance-checked against exact answers
  * (nondeterministic across engines, so excluded from the DuckDB oracle —
  * SURVEY.md §2.3). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact per-group distinct (q17's sketch twin)") {
    val events = Tables.load(spark, sf, "events")
    val exact = TierTwo.q17.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxUsersByType(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n < 0.15, s"$k: approx $a vs exact $n")
    }
  }

  test("approxQuantile brackets the exact median") {
    val events = Tables.load(spark, sf, "events")
    val Array(q50) = Sketches.approxQuantiles(events, "value", Array(0.5))
    val exact = events.select(expr("percentile(value, 0.5)")).head().getDouble(0)
    assert(math.abs(q50 - exact) / math.max(math.abs(exact), 1e-9) < 0.25,
      s"approx $q50 vs exact $exact")
  }
}
