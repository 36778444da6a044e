package graft

import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** Layout-side scale techniques: partition pruning from hive-partitioned
  * writes (bucketed co-location is pinned in ScaleTechniqueSpec).
  */
class WarehouseSpec extends SparkSpec {

  test("partitioned write prunes: lang filter scans only matching directories") {
    val tmp = java.nio.file.Files.createTempDirectory("wh-part").toString
    val docs = Tables.load(spark, sf, "documents")
    Warehouse.writePartitioned(docs, s"$tmp/docs", "lang")
    // directory layout is hive-style
    val langDirs = new java.io.File(s"$tmp/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.length >= 3, s"expected lang=* dirs, got ${langDirs.mkString(",")}")

    val read = spark.read.parquet(s"$tmp/docs").filter(col("lang") === "en")
    // pruning shows in the scan: partition filters present, and the row
    // count matches the batch filter exactly
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(800))
    assert(read.count() == docs.filter(col("lang") === "en").count())
    // partition column round-trips (moved from data to directory and back)
    assert(read.columns.contains("lang"))
  }

  test("bucketed write through the API joins without Exchange") {
    val events = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type")
    Warehouse.writeBucketed(events, "events_wb", 8, "user_id")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("events_wb")
      val selfAgg = t.groupBy("user_id").agg(count(lit(1)).as("n"))
      val plan = selfAgg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy on the bucket key must not shuffle:\n${plan.take(800)}")
      assert(selfAgg.count() == events.select("user_id").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS events_wb")
    }
  }

  test("sharded write bounds rows per file and conserves every row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-shard").toString
    try {
      val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      val total = docs.count()
      Warehouse.writeSharded(docs.repartition(2), s"$tmp/shards", maxRecordsPerFile = 60L)
      val files = new java.io.File(s"$tmp/shards").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      // cap honored per file, floor follows from 2 input partitions of ~250
      assert(files.length >= (total / 60L).toInt, s"only ${files.length} files")
      files.foreach { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        assert(n <= 60L, s"${f.getName} holds $n rows > cap")
      }
      val back = spark.read.parquet(s"$tmp/shards")
      assert(back.count() == total)
      assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
      intercept[IllegalArgumentException] {
        Warehouse.writeSharded(docs, s"$tmp/bad", maxRecordsPerFile = 0L)
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
