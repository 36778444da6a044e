package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Encoding-robustness gate for the events reader (VERDICT r7 items #1/#2).
  *
  * Round 7 lost 12 oracle queries because the driver re-encoded `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) while the loader assumed NANOS —
  * 30 days silently collapsed into 43 minutes. This suite writes the SAME rows
  * under every encoding the corpus could plausibly arrive in (annotated
  * micros/millis/nanos, bare int64 in each epoch unit) and requires
  * [[Tables.loadEvents]] to produce byte-identical values from all of them; a
  * deliberately mis-annotated fixture must trip the load-time sanity gate
  * rather than load skewed.
  */
class TablesSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  // Three event times inside the corpus's real span (2024), at µs precision.
  private val epochMicros = Seq(
    1704067200000000L, // 2024-01-01T00:00:00Z
    1704070800123456L, // 2024-01-01T01:00:00.123456Z
    1706572800000000L) // 2024-01-30T00:00:00Z

  /** Writes a single-column-schema-complete events part file with `ts` as
    * INT64 carrying `values`, annotated per `annotation` (null = bare int64).
    */
  private def writeFixture(
      dir: java.io.File, values: Seq[Long],
      annotation: Option[LogicalTypeAnnotation]): Unit = {
    val tsType = {
      val b = Types.optional(PrimitiveTypeName.INT64)
      annotation.fold(b.named("ts"))(a => b.as(a).named("ts"))
    }
    val schema = new MessageType("events",
      Types.optional(PrimitiveTypeName.INT64).named("event_id"),
      tsType,
      Types.optional(PrimitiveTypeName.INT64).named("user_id"),
      Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"),
      Types.optional(PrimitiveTypeName.DOUBLE).named("value"),
      Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(new java.io.File(dir, "part-00000.parquet").toString))
      .withConf(conf).withType(schema).build()
    val factory = new SimpleGroupFactory(schema)
    try values.zipWithIndex.foreach { case (ts, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong); g.add("ts", ts); g.add("user_id", 7L)
      g.add("event_type", "view"); g.add("value", 1.0); g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
  }

  private def loadedTs(path: String): Seq[java.time.LocalDateTime] =
    Tables.loadEvents(spark, path).orderBy("event_id").collect()
      .map(_.getAs[java.time.LocalDateTime]("ts")).toSeq

  private def tsAnn(unit: TimeUnit, adjusted: Boolean) =
    Some(LogicalTypeAnnotation.timestampType(adjusted, unit))

  private val fixtures: Seq[(String, Seq[Long], Option[LogicalTypeAnnotation])] = Seq(
    ("micros_ntz", epochMicros, tsAnn(TimeUnit.MICROS, adjusted = false)),
    ("micros_utc", epochMicros, tsAnn(TimeUnit.MICROS, adjusted = true)),
    ("nanos_ntz", epochMicros.map(_ * 1000L), tsAnn(TimeUnit.NANOS, adjusted = false)),
    // millis-grained rows only: the annotation can't carry sub-ms precision
    ("raw_int64_micros", epochMicros, None),
    ("raw_int64_nanos", epochMicros.map(_ * 1000L), None),
    ("raw_int64_millis", epochMicros.map(_ / 1000L * 1000L).map(_ / 1000L), None),
    ("raw_int64_seconds", epochMicros.map(_ / 1000000L), None))

  test("t01: every plausible ts encoding loads to identical TIMESTAMP_NTZ values") {
    val base = Files.createTempDirectory("graft-tables-spec").toFile
    val expectedFull = epochMicros
      .map(us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    for ((name, values, ann) <- fixtures) {
      val dir = new java.io.File(base, name); dir.mkdirs()
      writeFixture(dir, values, ann)
      // truncated expectation for the encodings that can't carry full µs
      val expected = name match {
        case "raw_int64_millis"  => expectedFull.map(t => t.minusNanos(t.getNano % 1000000L))
        case "raw_int64_seconds" => expectedFull.map(_.withNano(0))
        case _                   => expectedFull
      }
      val got = loadedTs(dir.toString)
      assert(got == expected, s"fixture $name loaded $got, expected $expected")
      val loadedType = Tables.loadEvents(spark, dir.toString).schema("ts").dataType
      assert(loadedType == org.apache.spark.sql.types.TimestampNTZType,
        s"fixture $name loaded ts as $loadedType")
    }
  }

  test("t02: mis-annotated file (claims MICROS, carries nanos) fails loudly at load") {
    val dir = Files.createTempDirectory("graft-tables-bad").toFile
    writeFixture(dir, epochMicros.map(_ * 1000L), tsAnn(TimeUnit.MICROS, adjusted = false))
    val e = intercept[IllegalArgumentException](Tables.loadEvents(spark, dir.toString))
    assert(e.getMessage.contains("sanity check failed"))
  }

  test("t04: every declared table loads through its pinned schema, non-empty") {
    // the cheapest cross-regen insurance for the other nine tables: a
    // driver-side type change surfaces here as a read error or zero rows,
    // not as silently skewed query outputs
    for (name <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      assert(Tables.load(spark, sf, name).count() > 0, s"table $name loaded empty")
    }
  }

  test("t03: the real corpus loads with ts spanning a plausible [2000,2100] range") {
    import org.apache.spark.sql.functions.{max, min}
    val Row(lo: java.time.LocalDateTime, hi: java.time.LocalDateTime) =
      Tables.load(spark, sf, "events").agg(min("ts"), max("ts")).head()
    assert(lo.getYear >= 2000 && hi.getYear <= 2100, s"corpus events span [$lo, $hi]")
    // the round-7 failure mode: 30 days collapsing into under an hour
    assert(java.time.Duration.between(lo, hi).toDays >= 1,
      s"corpus events span [$lo, $hi] — suspiciously compressed")
  }
}
