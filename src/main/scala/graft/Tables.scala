package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Schema-pinned readers for the driver's parquet corpus
  * (`/root/testdata/<sf>/<table>.parquet`, see TESTDATA.md / FIXTURES.md §1).
  *
  * Schemas are declared, never inferred (SURVEY.md §1.2: the reference pins its
  * input schema at compile time via Jackson annotations on `Tweet.java:10-21`;
  * we pin ours here). Passing an explicit schema to the parquet scan also lets
  * Catalyst prune columns / push filters without a footer-sampling pass — at
  * 100 TB the footer sample alone is a full-cluster job we skip.
  */
object Tables {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  /** The tweet-stream proxy for batch verification of the reference's windowed
    * ops (SURVEY.md §2.3 tier 1). `ts` is the event-time column (mirror of
    * `Tweet.timestamp_ms`, `/root/reference` Tweet.java:17-18).
    *
    * The file stores `ts` as parquet INT64 TIMESTAMP(NANOS), which Spark's
    * reader rejects as a timestamp; we read it as raw nanos (pinned LongType +
    * `spark.sql.legacy.parquet.nanosAsLong`) and convert to TIMESTAMP_NTZ in
    * [[load]] (the corpus has no sub-microsecond components, verified — so
    * the µs truncation is lossless and matches DuckDB's own ns→µs read).
    */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Timestamp policy: everything is TIMESTAMP_NTZ wall-clock UTC. The corpus
    * parquet is written without UTC-adjustment (`isAdjustedToUTC=false`), the
    * session timezone is pinned to UTC, and emitting NTZ keeps our output
    * parquet annotated identically to the DuckDB oracle's — so the driver's
    * hash compare sees the same logical values on both sides.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Session-wide conf, set only on the one table that needs it (events
    // stores ts as INT64 TIMESTAMP(NANOS)). It is idempotent and ALSO set in
    // the Verify/Bench/test session builders; kept here as well because the
    // driver smoke-checks SparkEntry.entry(spark) with a session it builds
    // itself, where this is the only place the conf can come from. Global
    // effect documented: any other nanos-parquet read in the same session
    // will see LongType instead of an error.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df
  }
}
