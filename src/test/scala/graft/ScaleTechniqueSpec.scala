package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** The shuffle-management techniques SURVEY.md §2.2 commits to for 100 TB:
  * bucketed co-located joins (no Exchange at join time) and salted
  * aggregation for skewed keys (same answer, parallel hot key).
  */
class ScaleTechniqueSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no shuffle Exchange in the plan") {
    // warehouse dir is a temp dir set by SparkSpec (static conf)
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    // disable auto-broadcast so the join would otherwise need a shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() == orders.count()) // every order has a customer
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("saltedSum caveat: hot key in ONE input partition stays on one salt; repartition-first fans it out") {
    import spark.implicits._
    // the documented failure shape (Skew.scala): 10k hot-key rows all in a
    // single input partition — e.g. a source file sorted by the hot key
    val rows = ((1 to 10000).map(i => ("hot", 1L)) ++ (1 to 64).map(i => (s"cold$i", 1L)))
      .toDF("k", "v")
    val concentrated = rows.repartition(8, col("k")) // hash(k) → all "hot" rows on one partition
    def hotSaltCount(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy(col("k"), pmod(spark_partition_id(), lit(16)).as("salt"))
      .count().filter(col("k") === "hot").count()
    // without the remedy the partition-id salt CANNOT split the hot group
    assert(hotSaltCount(concentrated) == 1L, "hot key concentrated on one salt (the caveat)")
    // the remedy: round-robin repartition first → the hot group fans out
    val spread = concentrated.repartition(8)
    assert(hotSaltCount(spread) > 1L, "repartition-first must fan the hot key out")
    // and BOTH shapes still aggregate to the exact same totals
    val expected = rows.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (input <- Seq(concentrated, spread)) {
      val got = Skew.saltedSum(input, col("k"), col("v"), salts = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("AQE splits a skewed JOIN partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key carrying ~200k rows vs 64 cold keys; a plain hash join
    // would put every hot row in one reducer task
    val left = spark.range(200000).select(lit("hot").as("k"), col("id").as("v"))
      .union(spark.range(64).select(concat(lit("c"), col("id")).as("k"), col("id").as("v")))
    val right = (Seq("hot") ++ (0 until 64).map(i => s"c$i")).toDF("k")
      .withColumn("r", length(col("k")))
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> spark.conf.get(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would plan its own) so AQE's
      // final physical plan is what toString renders
      assert(joined.collect().length == 200000 + 64)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must have split the hot partition:\n${plan.take(1000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted co-pair self-join ≡ the naive join; the whale key spreads across salts") {
    import spark.implicits._
    // one whale key with 40 items (1560 ordered pairs) + small keys
    val df = ((1 to 40).map(i => (0L, i.toLong)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 9L))).toDF("c", "su")
    val naive = df.as("a").join(df.as("b"),
        col("b.c") === col("a.c") && col("a.su") =!= col("b.su"))
      .select(col("a.c").as("k"), col("a.su").as("ia"), col("b.su").as("ib"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCoPairs(df, col("c"), col("su")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == naive, "salting must not change the pair set")
    assert(salted.count(_._1 == 0L) == 40 * 39, "whale pair count intact")
    // the guard's point: the whale's left leg lands on > 1 salt, so its
    // quadratic pair output spreads over > 1 join task
    val whaleSalts = df.filter(col("c") === 0L)
      .select(pmod(xxhash64(col("su")), lit(8L))).distinct().count()
    assert(whaleSalts > 1, "whale items must spread across salts")
  }

  test("half co-pairs + post-agg mirror ≡ full co-pair aggregation (q154/q182 rewrite)") {
    import spark.implicits._
    val df = ((1 to 40).map(i => (0L, i.toLong)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 9L))).toDF("c", "su")
    // the r15 rewrite: the shared-count is symmetric, so aggregate the
    // ia < ib half (half the Σd² aggregation input) and mirror the
    // AGGREGATED pair-count-sized frame
    val full = Skew.saltedCoPairs(df, col("c"), col("su"))
      .groupBy(col("ia").as("s_a"), col("ib").as("s_b"))
      .agg(count(lit(1)).as("shared")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val half = Skew.saltedCoPairsHalf(df, col("c"), col("su"))
      .groupBy(col("ia").as("s_a"), col("ib").as("s_b"))
      .agg(count(lit(1)).as("shared"))
    val mirrored = half.unionByName(half.select(col("s_b").as("s_a"),
        col("s_a").as("s_b"), col("shared"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mirrored == full, "mirror of the half aggregation must equal the full aggregation")
    assert(half.filter(col("s_a") >= col("s_b")).count() == 0, "half emits ia < ib only")
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val events = Tables.load(spark, sf, "events")
    // partition-id salting needs the input spread over partitions — the
    // documented caveat: a single-file source must be repartitioned first
    val spread = events.repartition(8, col("event_id"))
    val direct = events.groupBy(col("event_type").as("k"))
      .agg(sum(col("value")).as("total"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
    val salted = Skew.saltedSum(spread, col("event_type"), col("value"), salts = 16)
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(salted == direct)
    // and the salted first phase really fans the hot key out
    val phase1Groups = spread
      .groupBy(col("event_type"), pmod(spark_partition_id(), lit(16)))
      .count().count()
    assert(phase1Groups > direct.size, "salt must split groups")
  }
}
