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
    * The driver has shipped this column as INT64 TIMESTAMP(NANOS) in one corpus
    * generation and TIMESTAMP(MICROS) in another, so [[load]] never assumes a
    * unit: it sniffs the logical-type annotation from ONE part-file footer (a
    * bounded metadata read — no cluster job at any scale) and converts
    * accordingly. The canonical loaded type is always TIMESTAMP_NTZ. This
    * schema describes the logical shape; `ts`'s physical read type is chosen
    * per-footer in [[loadEvents]].
    */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventsWithTs(tsType: DataType): StructType =
    StructType(events.map(f => if (f.name == "ts") f.copy(dataType = tsType) else f))

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
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$sfDir/events.parquet")
    else spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  /** What one part-file footer says about the `ts` column: the logical
    * annotation's unit (`"NANOS"`/`"MICROS"`/`"MILLIS"`, or `"RAW_INT64"` when
    * the column is a bare int64), whether it is UTC-adjusted, and the min/max
    * column statistics across that file's row groups (absent if the writer
    * skipped statistics).
    */
  private[graft] final case class TsFooter(
      unit: String, adjustedUtc: Boolean, statMin: Option[Long], statMax: Option[Long])

  /** One footer read per distinct events path per JVM: Verify/Bench load
    * the table once per query, and the annotation cannot change mid-run
    * (the corpus directory is immutable for a session's lifetime). */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, TsFooter]()

  private[graft] def sniffTs(spark: SparkSession, path: String): TsFooter =
    footerCache.computeIfAbsent(path, p => sniffTsUncached(spark, p))

  private def sniffTsUncached(spark: SparkSession, path: String): TsFooter = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).iterator.map(_.getPath)
          .filter { q =>
            val n = q.getName
            n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
          }
          .toSeq.sortBy(_.getName).headOption
          .getOrElse(throw new IllegalStateException(s"no parquet part files under $path"))
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val md = reader.getFooter
      val schema = md.getFileMetaData.getSchema
      require(schema.containsField("ts"), s"events parquet at $path has no `ts` column")
      val tsField = schema.getType(Seq("ts"): _*).asPrimitiveType()
      val (unit, adjusted) = tsField.getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation => (t.getUnit.toString, t.isAdjustedToUTC)
        case _                                 => ("RAW_INT64", false)
      }
      var mn, mx = Option.empty[Long]
      for {
        block <- md.getBlocks.asScala
        col   <- block.getColumns.asScala if col.getPath.toDotString == "ts"
        st = col.getStatistics if st != null && !st.isEmpty && st.hasNonNullValue
      } (st.genericGetMin, st.genericGetMax) match {
        case (lo: java.lang.Long, hi: java.lang.Long) =>
          mn = Some(mn.fold(lo.longValue)(math.min(_, lo.longValue)))
          mx = Some(mx.fold(hi.longValue)(math.max(_, hi.longValue)))
        case _ => ()
      }
      TsFooter(unit, adjusted, mn, mx)
    } finally reader.close()
  }

  private val MicrosAt2000 = 946684800000000L   // 2000-01-01T00:00:00Z
  private val MicrosAt2100 = 4102444800000000L  // 2100-01-01T00:00:00Z

  /** Footer-driven events reader. One bounded metadata read decides the `ts`
    * decoding, so a driver-side corpus re-encode (the round-7 regression:
    * NANOS → MICROS silently collapsed 30 days into 43 minutes) can never
    * silently skew event time again:
    *
    *   - TIMESTAMP(MICROS/MILLIS) → read as timestamp directly (NTZ when the
    *     annotation is wall-clock, instant+cast when UTC-adjusted; the session
    *     timezone is pinned UTC so both yield the same NTZ values);
    *   - TIMESTAMP(NANOS) → Spark's reader has no nanos timestamp type, so
    *     read raw longs (`spark.sql.legacy.parquet.nanosAsLong`, set only on
    *     this path) and truncate to µs — lossless for this corpus;
    *   - bare INT64 → infer the epoch unit from the footer statistics'
    *     magnitude (ns ≥ 1e17 > µs ≥ 1e14 > ms ≥ 1e11 > s; the bands are
    *     ~5,000 years wide, unambiguous for any plausible corpus).
    *
    * A load-time sanity gate then requires the converted footer min/max to land
    * inside [2000, 2100]: a mis-annotated file fails loudly at load instead of
    * feeding every window query 1970-epoch garbage (VERDICT r7 item #2).
    */
  private[graft] def loadEvents(spark: SparkSession, path: String): DataFrame = {
    val footer = sniffTs(spark, path)
    val resolvedUnit = footer.unit match {
      case "RAW_INT64" =>
        val probe = footer.statMin.orElse(footer.statMax).getOrElse(throw new IllegalStateException(
          s"events `ts` at $path is a bare int64 with no column statistics; cannot infer its epoch unit"))
        val m = math.abs(probe)
        if (m >= 100000000000000000L) "NANOS"
        else if (m >= 100000000000000L) "MICROS"
        else if (m >= 100000000000L) "MILLIS"
        else "SECONDS"
      case u => u
    }
    val toMicros: Long => Long = resolvedUnit match {
      case "NANOS"   => _ / 1000L
      case "MICROS"  => identity
      case "MILLIS"  => _ * 1000L
      case "SECONDS" => _ * 1000000L
    }
    for (lo <- footer.statMin; hi <- footer.statMax) {
      val (loUs, hiUs) = (toMicros(lo), toMicros(hi))
      require(loUs >= MicrosAt2000 && hiUs < MicrosAt2100,
        s"events `ts` sanity check failed at $path: footer annotates ${footer.unit} " +
          s"(resolved $resolvedUnit) but converted range [${java.time.Instant.ofEpochSecond(0, loUs * 1000)}, " +
          s"${java.time.Instant.ofEpochSecond(0, hiUs * 1000)}] falls outside [2000, 2100] — " +
          "the corpus encoding and the reader's unit disagree")
    }
    footer.unit match {
      case "MICROS" | "MILLIS" =>
        if (!footer.adjustedUtc)
          spark.read.schema(eventsWithTs(TimestampNTZType)).parquet(path)
        else
          spark.read.schema(eventsWithTs(TimestampType)).parquet(path)
            .withColumn("ts", expr("cast(ts as timestamp_ntz)"))
      case _ => // NANOS or bare INT64: read raw longs, convert per resolved unit
        if (footer.unit == "NANOS")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val conv = resolvedUnit match {
          case "NANOS"   => "ts div 1000"
          case "MICROS"  => "ts"
          case "MILLIS"  => "ts * 1000"
          case "SECONDS" => "ts * 1000000"
        }
        spark.read.schema(eventsWithTs(LongType)).parquet(path)
          .withColumn("ts", expr(s"cast(timestamp_micros($conv) as timestamp_ntz)"))
    }
  }
}
