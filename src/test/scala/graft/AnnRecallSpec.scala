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

  test("trained-IVF store partitioned by cell: probe reads ONE cell directory ≡ q70") {
    // the write-time layout half of q70's story: persist the trained index
    // hive-partitioned by cell, and the probe's cell filter becomes a
    // PARTITION filter — one directory of I/O per probe at any corpus size
    import graft.operators.TierNine
    import graft.sources.Warehouse
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("ivf_store").toString
    Warehouse.writePartitioned(TierNine.ivfIndex(spark, sf01), path, "cell")
    val store = spark.read.parquet(path)
    // a vector's own assignment IS its nearest centroid — q70's `best` for
    // query 0 (getAs[Number]: hive partition-value inference types cell INT)
    val bestCell = store.filter(col("vec_id") === 0)
      .select("cell").head().getAs[Number](0).longValue
    val probed = store.filter(col("cell") === bestCell)
    probed.collect() // execute so the scan's pruning metrics populate
    val scan = probed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("cell"),
      scan.metadata.toString.take(600))
    assert(scan.metrics("numFiles").value == 1,
      s"probe must read ONE cell's file, read ${scan.metrics("numFiles").value}")
    // end-to-end: ranking the pruned store's survivors ≡ the declared q70
    graft.expressions.GraftFunctions.register(spark)
    def dot(x: String, y: String) = call_function("graft_dot", col(x), col(y))
    val q0 = store.filter(col("vec_id") === 0).select(col("e").as("qv"))
    val got = probed.filter(col("vec_id") =!= 0).crossJoin(broadcast(q0))
      .select(col("vec_id"),
        round(dot("e", "qv") / (sqrt(dot("e", "e")) * sqrt(dot("qv", "qv"))), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val declared = TierNine.q70.run(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == declared, "pruned-store probe must reproduce q70 exactly")
  }

  test("int8-quantized store: 4x smaller codes keep brute-force top-10 recall ≥ 0.8") {
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    graft.expressions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val codes = emb.select(col("vec_id"), Ann.quantizeInt8(col("e")).as("qe"))
    assert(codes.schema("qe").dataType.simpleString == "array<tinyint>",
      "codes must store as TINYINT (4x smaller than FLOAT)")
    val deq = codes.select(col("vec_id"), Ann.dequantize(col("qe")).as("e"))
    def dot(x: String, y: String) = call_function("graft_dot", col(x), col(y))
    val q0 = deq.filter(col("vec_id") === 0).select(col("e").as("qv"))
    val top = deq.filter(col("vec_id") =!= 0).crossJoin(broadcast(q0))
      .select(col("vec_id"),
        (dot("e", "qv") / (sqrt(dot("e", "e")) * sqrt(dot("qv", "qv")))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
    val exact = ids(TierThree.q24.run(spark, sf01))
    val recall = ids(top).intersect(exact).size / 10.0
    info(s"int8 store recall: $recall")
    assert(recall >= 0.8, s"int8 recall $recall under the 0.8 floor")
    // the all-zero vector codes to all-zero (no division blowup)
    val z = spark.sql("SELECT array(0.0d, 0.0d) AS e")
      .select(Ann.quantizeInt8(col("e")).as("q")).head().getSeq[Byte](0)
    assert(z == Seq(0, 0))
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
