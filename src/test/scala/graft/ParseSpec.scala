package graft

import graft.streaming.TweetPipelines

/** S2 deserialization edge cases (SURVEY.md §1.2, FIXTURES.md §2): the
  * reference returns null from Jackson failures and NPEs downstream
  * (Main.java:213-217); the engine filters the null struct — defined
  * behavior on bad records, same observable behavior on clean ones.
  */
class ParseSpec extends SparkSpec {
  import spark.implicits._

  test("malformed JSON and null-text rows are dropped; clean rows survive") {
    val raw = Seq(
      """{"text":"good #one","createdAt":1000,"lang":"en"}""",
      """not json at all""",
      """{"text":"trailing brace","createdAt":2000""", // truncated
      """{"createdAt":3000,"lang":"en"}""", // no text → null text
      """{"text":"also good","createdAt":4000,"lang":"de"}""").toDF("value")
    val parsed = TweetPipelines.parse(raw).collect()
    assert(parsed.map(_.getAs[String]("text")).toSet == Set("good #one", "also good"))
  }

  test("unknown JSON properties are ignored (raw-firehose tolerance, Tweet.java:10)") {
    val raw = Seq(
      """{"text":"rt something","createdAt":1570508135121,"lang":"en",""" +
        """"id":123456789,"user":{"name":"x","followers_count":42},""" +
        """"entities":{"hashtags":[{"text":"flink"}]},"retweeted":false}""").toDF("value")
    val parsed = TweetPipelines.parse(raw).collect()
    assert(parsed.length == 1)
    assert(parsed.head.getAs[Long]("createdAt") == 1570508135121L)
  }

  test("raw firehose without createdAt parses but has null event time (documented quirk)") {
    // the reference binds timestamp_ms to a "createdAt" property; true
    // firehose JSON has created_at (a date string) instead → reference gets
    // 0, engine gets null ts (row visible to non-time ops, dropped by
    // event-time windows) — SURVEY.md §1.2
    val raw = Seq(
      """{"text":"firehose-ish","created_at":"Wed Oct 09 05:35:35 +0000 2019","lang":"en"}""")
      .toDF("value")
    val parsed = TweetPipelines.parse(raw).collect()
    assert(parsed.length == 1)
    assert(parsed.head.isNullAt(parsed.head.fieldIndex("ts")))
  }

  test("hashtag tokenizer edge cases match the reference regex #\\w+ (Main.java:189)") {
    val raw = Seq(
      """{"text":"#a1_b ## #","createdAt":1000,"lang":"en"}""",
      """{"text":"no tags here","createdAt":2000,"lang":"en"}""",
      """{"text":"#x#y touching","createdAt":3000,"lang":"en"}""").toDF("value")
    val tags = TweetPipelines.hashtags(TweetPipelines.parse(raw))
      .collect().map(_.getAs[String]("hashtag")).toSeq.sorted
    // '#' alone and '##' produce nothing; adjacent tags both match
    assert(tags == Seq("#a1_b", "#x", "#y"))
  }
}
