package graft

import graft.operators.TierSixty
import org.apache.spark.sql.functions._

/** Tier-60 differentials: q203 against in-memory recounts of every
  * check (injected fires, honest zeros, the genuine ship-before-order
  * fire); q204 stage-conservation laws plus the clean-frame no-op.
  */
class TierSixtySpec extends SparkSpec {

  import spark.implicits._

  test("q203 ≡ in-memory recount per check; injected fires AND honest zeros both live") {
    val got = TierSixty.q203.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size === 6)
    val oKeys = Tables.load(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val lKeys = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0)).toSeq
    // injected checks: exact modular counts
    assert(got("fk_orders_customer_inj") === oKeys.count(_ % 97 == 0).toLong,
      "every injected −1 custkey must orphan")
    assert(got("null_shipdate_inj") === lKeys.count(_ % 89 == 0).toLong)
    assert(got("pk_duplicate_orders_inj") === oKeys.count(_ % 101 == 0).toLong,
      "every echoed key must be flagged duplicate")
    // honest zeros on the clean data
    assert(got("fk_lineitem_orders") === 0L)
    assert(got("range_quantity") === 0L)
    // the genuine-data fire: recount from first principles
    val od = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    val shipViol = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_shipdate").collect()
      .count(r => r.getAs[java.time.LocalDateTime](1).isBefore(od(r.getLong(0))))
    assert(got("ship_before_order") === shipViol.toLong && shipViol > 0,
      "the fixture's impossible ship-before-order rows must surface")
  }

  test("q204 laws: stage conservation on the fixture; a clean frame repairs to itself") {
    val got = TierSixty.q204.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a_rows_in") - got("b_fk_dropped") - got("c_dup_dropped")
      === got("d_kept"), "stages must conserve rows")
    assert(got("b_fk_dropped") > 0 && got("c_dup_dropped") > 0,
      "both repair stages must fire on the injected frame")
    // expected from first principles: orphans = injected keys (base +
    // echoed copies that are ALSO %101); dups = echoed keys surviving fk
    val oKeys = Tables.load(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val orphans = oKeys.count(_ % 97 == 0) + oKeys.count(k => k % 97 == 0 && k % 101 == 0)
    val dups = oKeys.count(k => k % 101 == 0 && k % 97 != 0)
    assert(got("b_fk_dropped") === orphans.toLong)
    assert(got("c_dup_dropped") === dups.toLong)
    assert(got("a_rows_in") === (oKeys.size + oKeys.count(_ % 101 == 0)).toLong)
  }
}
