package graft

import graft.streaming.{QueryableState, TweetPipelines}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** s10 — Q1 queryable state: live point lookups against a running
  * aggregation's state (reference QueryableStateClientTest.java:16-46 polls
  * a keyed count by key while the job runs; here the memory-sink table IS
  * that state surface and [[QueryableState.lookup]] is the client).
  */
class QueryableStateSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tweet(text: String, atMs: Long): String =
    s"""{"text":"$text","createdAt":$atMs,"lang":"en"}"""

  test("s10: lookup by key reflects live aggregation state across triggers") {
    val in = MemoryStream[String]
    // hashtag totals — a keyed running aggregate, the reference's queried state
    val counts = TweetPipelines.hashtags(TweetPipelines.parse(in.toDF()))
      .groupBy("hashtag").count()
    val q = QueryableState.serve(counts, "qs_counts")
    try {
      in.addData(tweet("x #spark", 1000), tweet("y #spark #flink", 2000))
      q.processAllAvailable()
      val spark1 = QueryableState.lookup(spark, "qs_counts", "hashtag", "#spark")
        .collect().map(_.getLong(1))
      assert(spark1.toSeq == Seq(2L), s"got ${spark1.toSeq}")

      // state advances; the same client lookup sees the new value
      in.addData(tweet("z #spark", 3000))
      q.processAllAvailable()
      val spark2 = QueryableState.lookup(spark, "qs_counts", "hashtag", "#spark")
        .collect().map(_.getLong(1))
      assert(spark2.toSeq == Seq(3L), s"got ${spark2.toSeq}")

      // missing key → empty, not an error (client contract)
      assert(QueryableState.lookup(spark, "qs_counts", "hashtag", "#nope").count() == 0)
      // full snapshot is the complete current state
      val snap = QueryableState.snapshot(spark, "qs_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(snap == Map("#spark" -> 3L, "#flink" -> 1L), s"got $snap")
    } finally q.stop()
  }
}
