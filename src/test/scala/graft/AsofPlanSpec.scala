package graft

import graft.operators.TierFive
import graft.plans.Asof
import org.apache.spark.sql.functions._

/** The native as-of join (custom LogicalPlan/Strategy/SparkPlan) against
  * the composed union+window formulation (q42) — row-identical output,
  * better physical plan.
  */
class AsofPlanSpec extends SparkSpec {

  private def native() = {
    val ev = Tables.load(spark, sf, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    Asof.join(errors, purchases,
      Seq("user_id"), Seq("p_user"), Seq("ts", "event_id"), Seq("p_ts", "pid"))
  }

  test("native as-of join ≡ composed union+window (q42) row-for-row") {
    val nat = native()
      .select(col("event_id"), col("pid").as("last_purchase_id"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    val composed = TierFive.q42.run(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(nat.nonEmpty)
    assert(nat.toSeq == composed.toSeq)
  }

  test("as-of plan: AsOfJoinExec, no Window, no union doubling, no cartesian") {
    val plan = native().queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
    assert(!plan.contains("Union"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("as-of join is left-outer: rows with no earlier match keep nulls") {
    import spark.implicits._
    val l = Seq((1L, "u1", 10L), (2L, "u1", 5L), (3L, "u2", 7L))
      .toDF("lid", "k", "t")
    val r = Seq((100L, "u1", 6L), (101L, "u1", 9L), (102L, "u3", 1L))
      .toDF("rid", "rk", "rt")
    val out = Asof.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .select("lid", "rid").collect()
      .map(row => row.getLong(0) -> Option(row.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      1L -> Some(101L), // t=10: latest earlier purchase rt=9
      2L -> None,       // t=5: nothing strictly earlier
      3L -> None))      // u2: no right rows for the key at all
  }

  test("as-of join differential: random datasets match a pure-Scala oracle") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // heavy key collisions + duplicated times force every code path: merge
    // across key groups, intra-key two-pointer advance, ties, missing keys
    val rowGen = Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(0L, 40L))
    def rows(seedBase: Long, n: Int): Seq[(Int, Long)] =
      (0 until n).flatMap(i => rowGen.apply(Gen.Parameters.default, Seed(seedBase + i)))
    for (seed <- 0 until 5) {
      val lRows = rows(seed * 1000L, 120).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, s"k$k", t) }
      val rRows = rows(seed * 1000L + 500, 150).zipWithIndex
        .map { case ((k, t), i) => (1000L + i, s"k$k", t) }
      val expected = lRows.map { case (lid, k, t) =>
        val m = rRows.filter(r => r._2 == k &&
          (r._3 < t || (r._3 == t && r._1 < lid))) // (t, id) lexicographic strict <
        lid -> m.sortBy(r => (r._3, r._1)).lastOption.map(_._1)
      }.toMap
      val out = Asof.join(
          lRows.toDF("lid", "k", "t"), rRows.toDF("rid", "rk", "rt"),
          Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      assert(out == expected, s"seed $seed diverged")
    }
  }

  test("column pruning reaches the scan through the custom node (Rule leg)") {
    // join over the FULL events table, then select two columns — without
    // PruneAsOfJoinColumns the custom node is an optimizer barrier and the
    // scan reads every column
    val ev = Tables.load(spark, sf, "events")
    val errors = ev.filter(col("event_type") === "error")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"), col("props").as("p_props"))
    val out = Asof.join(errors, purchases,
        Seq("user_id"), Seq("p_user"), Seq("ts", "event_id"), Seq("p_ts", "pid"))
      .select(col("event_id"), col("pid").as("last_purchase_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("p_props") && !plan.contains("p_value"),
      "unused right columns must be pruned before the exec:\n" + plan.take(1200))
    // and the parquet scans must not read the wide props column at all
    assert(!plan.contains("props"), "scan must prune props:\n" + plan.take(1200))
    assert(out.count() > 0)
  }

  test("bucketed children satisfy the distribution: as-of join with ZERO Exchange") {
    // the one scale claim of AsOfJoin.scala's scaladoc not previously
    // executed: pre-bucketed tables satisfy requiredChildDistribution, so
    // EnsureRequirements elides both shuffles — the join reads co-located
    // buckets straight off the warehouse (only per-partition Sorts remain,
    // because the tables are bucket-SORTED by key alone, not (key, ts))
    val ev = Tables.load(spark, sf, "events")
    graft.sources.Warehouse.writeBucketed(
      ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts"),
      "asof_errors_b", 8, "user_id")
    graft.sources.Warehouse.writeBucketed(
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("p_user"), col("ts").as("p_ts")),
      "asof_purchases_b", 8, "p_user")
    try {
      val joined = Asof.join(
        spark.table("asof_errors_b"), spark.table("asof_purchases_b"),
        Seq("user_id"), Seq("p_user"), Seq("ts", "event_id"), Seq("p_ts", "pid"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan.take(800))
      assert(!plan.contains("Exchange"),
        s"bucketed as-of join must not shuffle:\n${plan.take(1200)}")
      // and the elided shuffle does not change the answer: same (error →
      // last purchase) map as the shuffling plan over the raw parquet
      val bucketed = joined.select("event_id", "pid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val shuffled = native().select("event_id", "pid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      assert(bucketed.nonEmpty)
      assert(bucketed == shuffled)
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_errors_b")
      spark.sql("DROP TABLE IF EXISTS asof_purchases_b")
    }
  }

  test("as-of join rejects mismatched key/order types instead of comparing garbage") {
    import spark.implicits._
    val l = Seq((1L, 1, 10L)).toDF("lid", "k", "t")       // k: INT
    val r = Seq((100L, 1L, 6L)).toDF("rid", "rk", "rt")   // rk: BIGINT
    val e = intercept[IllegalArgumentException](
      Asof.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid")))
    assert(e.getMessage.contains("types differ"))
  }

  test("as-of join null semantics: null keys match GROUP-style, null order sorts first") {
    import spark.implicits._
    // scaladoc contract: a null left key matches a null right key (as
    // groupBy groups nulls), and a null order value counts as earlier than
    // everything (ASC NULLS FIRST)
    val l = Seq((1L, Option("u"), 10L), (2L, Option.empty[String], 10L))
      .toDF("lid", "k", "t")
    val r = Seq(
      (100L, Option("u"), 5L),           // matches lid=1 (same key, earlier)
      (200L, Option.empty[String], 7L),  // matches lid=2 (null key group)
      (300L, Option.empty[String], 2L))  // earlier null-key row, superseded by 200
      .toDF("rid", "rk", "rt")
    val out = Asof.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .select("lid", "rid").collect()
      .map(row => row.getLong(0) -> Option(row.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(200L)))
    // null ORDER value: sorts before every real time → matched by any left
    val r2 = Seq((400L, "u", Option.empty[Long])).toDF("rid", "rk", "rt")
    val l2 = Seq((1L, "u", Option(0L))).toDF("lid", "k", "t")
    val out2 = Asof.join(l2, r2, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .select("rid").collect().head
    assert(out2.getLong(0) == 400L, "null right order must count as earliest")
  }

  test("as-of join tie semantics: equal order tuple is NOT a match (strict <)") {
    import spark.implicits._
    val l = Seq((1L, "u", 10L)).toDF("lid", "k", "t")
    val r = Seq((100L, "u", 10L)).toDF("rid", "rk", "rt")
    // right (10,100) vs left (10,1): ts tie → compare ids, 100 > 1 → no match
    val strictLater = Asof.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .select("rid").collect().head
    assert(strictLater.isNullAt(0))
    // right (10,0) vs left (10,1): ts tie → 0 < 1 → matches (same as the
    // window form's (ts, id) total order)
    val r2 = Seq((0L, "u", 10L)).toDF("rid", "rk", "rt")
    val tieEarlier = Asof.join(l, r2, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .select("rid").collect().head
    assert(tieEarlier.getLong(0) == 0L)
  }
}
