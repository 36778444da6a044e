package graft

import graft.streaming.{BurstProcessor, TweetPipelines}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** s13 — the transformWithState burst detector (first-class timers, typed
  * RocksDB state) produces the SAME bursts as the flatMapGroupsWithState
  * twin on the same replay: both closure paths (inline gap close, timer
  * close) exercised.
  */
class BurstParitySpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tweet(text: String, atMs: Long): String =
    s"""{"text":"$text","createdAt":$atMs,"lang":"en"}"""

  test("s13: transformWithState bursts ≡ flatMapGroupsWithState bursts") {
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(name: String, build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[TweetPipelines.Burst]): Set[(String, Long, Long, Long)] = {
        val in = MemoryStream[String]
        val tags = TweetPipelines.hashtags(
          TweetPipelines.withLateness(TweetPipelines.parse(in.toDF()), "10 seconds"))
        val q = build(tags.toDF().selectExpr("hashtag", "ts")).writeStream
          .format("memory").queryName(name).outputMode("append").start()
        try {
          in.addData(tweet("a #x", 1000), tweet("b #x #z", 2000), tweet("c #x", 3000))
          q.processAllAvailable()
          in.addData(tweet("d #x", 300000), tweet("e #x", 301000)) // inline close of #x burst 1
          q.processAllAvailable()
          in.addData(tweet("flush #y", 700000))
          q.processAllAvailable()
          in.addData(tweet("flush2 #y", 710000)) // timer close of #x burst 2, #z burst
          q.processAllAvailable()
          spark.table(name).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        } finally q.stop()
      }
      val classic = run("s13_classic", df => TweetPipelines.hashtagBursts(df, 60000L))
      val tws = run("s13_tws", df => BurstProcessor.bursts(df, 60000L))
      assert(tws == classic, s"tws=$tws classic=$classic")
      assert(tws.contains(("#x", 1000L, 3000L, 3L)) && tws.contains(("#x", 300000L, 301000L, 2L)),
        s"got $tws")
      assert(tws.exists(_._1 == "#z"), s"single-event #z burst must close too: $tws")
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
  }
}
