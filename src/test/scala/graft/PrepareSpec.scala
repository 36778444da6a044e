package graft

import graft.operators.Prepare
import org.apache.spark.sql.functions._

/** The one-call preparation recipe: stage arithmetic, output hygiene,
  * split integrity, determinism. */
class PrepareSpec extends SparkSpec {

  private lazy val result = Prepare.corpus(
    Tables.load(spark, sf, "documents").select("doc_id", "text"))

  test("report arithmetic: monotone stages, splits partition the survivors") {
    val (out, r) = result
    assert(r.input == 500L)
    assert(r.afterGates <= r.input && r.afterGates > 0)
    assert(r.afterGates < r.input, "gates must actually drop something")
    assert(r.afterDedup <= r.afterGates && r.afterDedup > 0)
    assert(r.train + r.valid + r.test == r.afterDedup)
    assert(out.count() == r.afterDedup)
    assert(r.train > r.valid && r.train > r.test, "98/1/1 shape")
  }

  test("output hygiene: normalized, scrubbed, exact-dup free") {
    val (out, _) = result
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    rows.foreach { case (id, text, split) =>
      assert(!text.contains("<") && !text.contains("  ") &&
        text == text.trim, s"un-normalized text @$id")
      assert(!text.contains("@"), s"unscrubbed PII @$id")
      assert(Set("train", "valid", "test").contains(split))
    }
    assert(rows.map(_._2).distinct.length == rows.length,
      "no two survivors share a text")
  }

  test("deterministic: a second run reproduces ids, splits, and the report") {
    val (out, r) = result
    val (out2, r2) = Prepare.corpus(
      Tables.load(spark, sf, "documents").select("doc_id", "text"))
    assert(r2 == r)
    assert(out2.select("doc_id", "split").collect().map(x => (x.getLong(0), x.getString(1))).sortBy(_._1).toSeq ==
      out.select("doc_id", "split").collect().map(x => (x.getLong(0), x.getString(1))).sortBy(_._1).toSeq)
  }
}
