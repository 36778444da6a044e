package graft

import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** s14 — stream-stream interval join (streaming face of batch q37): two
  * watermarked MemoryStreams, matches only within the interval, bounded
  * state. Impression→click attribution shape.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("s14: clicks join their impression only within the attribution window") {
    val imps = MemoryStream[(String, Long)]   // (ad, ms)
    val clicks = MemoryStream[(String, Long)]
    val impDf = imps.toDF().select(col("_1").as("ad"),
      timestamp_millis(col("_2")).as("imp_ts"))
    val clickDf = clicks.toDF().select(col("_1").as("c_ad"),
      timestamp_millis(col("_2")).as("click_ts"))
    val joined = StreamJoins.intervalJoin(impDf, clickDf,
      "ad", "c_ad", "imp_ts", "click_ts", within = "10 seconds", delay = "5 seconds")
      .select(col("ad"), unix_millis(col("imp_ts")).as("i"),
        unix_millis(col("click_ts")).as("c"))
    val q = joined.writeStream.format("memory").queryName("s14_join")
      .outputMode("append").start()
    try {
      imps.addData(("a1", 10000L), ("a2", 12000L))
      clicks.addData(
        ("a1", 15000L),  // within [10s, 20s] → match
        ("a1", 25000L),  // beyond the 10 s window → no match
        ("a2", 11000L),  // before the impression → no match
        ("a3", 15000L))  // no impression for a3 → no match
      q.processAllAvailable()
      // advance both watermarks so all inner-join results finalize
      // (distinct keys — the advance rows must not join each other)
      imps.addData(("advL", 500000L)); clicks.addData(("advR", 500000L))
      q.processAllAvailable()
      val rows = spark.table("s14_join").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("a1", 10000L, 15000L)), s"got $rows")
    } finally q.stop()
  }
}
