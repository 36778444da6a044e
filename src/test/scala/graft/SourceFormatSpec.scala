package graft

import org.apache.spark.sql.functions._

/** Source-format breadth (SURVEY.md §2.2 scans/sources): the engine's pinned
  * schemas read the same data through csv and json as through parquet —
  * schema declared, never inferred, for every format.
  */
class SourceFormatSpec extends SparkSpec {

  test("csv and json roundtrips preserve the events slice under pinned schemas") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt").toString
    val slice = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").limit(200)
    slice.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    slice.write.mode("overwrite").json(s"$tmp/json")
    val schema = slice.schema
    val fromCsv = graft.sources.Warehouse.readCsv(spark, s"$tmp/csv", schema)
    val fromJson = graft.sources.Warehouse.readJsonLines(spark, s"$tmp/json", schema)
    val base = slice.collect().map(_.toSeq).toSet
    assert(fromCsv.collect().map(_.toSeq).toSet == base)
    assert(fromJson.collect().map(_.toSeq).toSet == base)
  }

  test("orc roundtrip preserves the slice AND pushes filters into the scan") {
    // ORC is the second columnar format Spark ships natively; the scale
    // property worth pinning is the same as parquet's — predicate pushdown
    // reaches the scan (PushedFilters), so a selective read never pays for
    // the full file
    val tmp = java.nio.file.Files.createTempDirectory("orc").toString
    val slice = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").limit(200)
    slice.write.mode("overwrite").orc(s"$tmp/orc")
    val back = spark.read.schema(slice.schema).orc(s"$tmp/orc")
    assert(back.collect().map(_.toSeq).toSet == slice.collect().map(_.toSeq).toSet)
    val filtered = back.filter(col("event_type") === "purchase").select("event_id")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"ORC scan must carry the pushed predicate:\n${scan.take(900)}")
    assert(filtered.count() > 0)
  }

  test("malformed csv rows are isolated, not fatal (PERMISSIVE + corrupt-record column)") {
    val tmp = java.nio.file.Files.createTempDirectory("badcsv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/x.csv"),
      "1,alpha,2.5\nnot-a-long,beta,3.5\n3,gamma,4.5\n")
    val df = spark.read
      .schema("id LONG, name STRING, v DOUBLE, _corrupt_record STRING")
      .csv(s"$tmp/x.csv")
      .cache() // corrupt-record column requires materialization before filter
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    df.unpersist()
  }
}
