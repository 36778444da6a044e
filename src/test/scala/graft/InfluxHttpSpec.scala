package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.streaming.{InfluxHttpConfig, InfluxHttpWriter}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream
import scala.collection.mutable.ArrayBuffer

/** X1 (HTTP flavor) — the batching/gzip line-protocol poster against a stub
  * InfluxDB `/ping` + `/write` server (reference InfluxDBSink.java:42-61
  * batches via influxdb-java; config surface InfluxDBConfig.java:26-255).
  * JDK HttpServer, zero dependencies.
  */
class InfluxHttpSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("measurement", StringType),
    StructField("time_ms", LongType),
    StructField("fields", MapType(StringType, StringType))))

  private def row(m: String, t: Long, fields: Map[String, String]): Row =
    new GenericRowWithSchema(Array[Any](m, t, fields), schema)

  /** (gzip'd?, decoded body, query string) per /write POST. */
  private final case class Req(gzip: Boolean, body: String, query: String)

  private def withServer(pingStatus: Int = 204, failWrites: Int = 0,
      failStatus: Int = 503,
      writeHits: java.util.concurrent.atomic.AtomicInteger =
        new java.util.concurrent.atomic.AtomicInteger,
      statusSeq: Seq[Int] = Nil)(
      f: (String, ArrayBuffer[Req]) => Unit): Unit = {
    val reqs = ArrayBuffer[Req]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(failWrites)
    val scripted = new java.util.concurrent.ConcurrentLinkedQueue[Integer]
    statusSeq.foreach(s => scripted.add(s))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ping", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(pingStatus, -1); ex.close()
      }
    })
    server.createContext("/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        writeHits.incrementAndGet() // every POST, failed or not
        val next = scripted.poll() // scripted per-request statuses first
        if (next != null && next.intValue() != 204) {
          ex.sendResponseHeaders(next.intValue(), -1); ex.close(); return
        }
        if (next == null && failures.getAndDecrement() > 0) { // failure injection
          ex.sendResponseHeaders(failStatus, -1); ex.close(); return
        }
        val gz = "gzip" == ex.getRequestHeaders.getFirst("Content-Encoding")
        val raw = new ByteArrayOutputStream()
        val in = if (gz) new GZIPInputStream(ex.getRequestBody) else ex.getRequestBody
        val buf = new Array[Byte](8192)
        Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
          .foreach(n => raw.write(buf, 0, n))
        reqs.synchronized {
          reqs += Req(gz, new String(raw.toByteArray, UTF_8), ex.getRequestURI.getRawQuery)
        }
        ex.sendResponseHeaders(204, -1); ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", reqs)
    finally server.stop(0)
  }

  test("x01: count-triggered batching — batchActions points per POST, close flushes the tail") {
    withServer() { (url, reqs) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, database = "twitter",
        batchActions = 3, flushDurationMs = 60000)) // time trigger effectively off
      assert(w.open(0, 0))
      (1 to 7).foreach(i => w.process(row("m", i.toLong, Map("count" -> i.toString))))
      w.close(null)
      val bodies = reqs.synchronized(reqs.toVector)
      assert(bodies.map(_.body.linesIterator.size) == Vector(3, 3, 1),
        s"expected 3+3+1 lines, got ${bodies.map(_.body)}")
      // line protocol shape + ns precision timestamp (ms · 10^6)
      assert(bodies.head.body.linesIterator.next() == "m count=\"1\" 1000000")
      // auth + database ride the query string, as influxdb-java sends them
      assert(bodies.head.query.contains("db=twitter") && bodies.head.query.contains("u=root")
        && bodies.head.query.contains("p=root") && bodies.head.query.contains("precision=ns"))
      assert(bodies.forall(!_.gzip))
    }
  }

  test("x02: enableGzip compresses the POST body (server round-trips it)") {
    withServer() { (url, reqs) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1, enableGzip = true))
      assert(w.open(0, 0))
      w.process(row("cpu", 5L, Map("v" -> "9"))) // batchActions ≤ 0 → immediate post
      w.close(null)
      val bodies = reqs.synchronized(reqs.toVector)
      assert(bodies.size == 1 && bodies.head.gzip, s"got $bodies")
      assert(bodies.head.body == "cpu v=\"9\" 5000000")
    }
  }

  test("x03: open fails fast when the server is unreachable/unhealthy") {
    withServer(pingStatus = 500) { (url, _) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url))
      val e = intercept[RuntimeException](w.open(0, 0))
      assert(e.getMessage.contains("unreachable"))
    }
  }

  test("x05: transient write failures retry with backoff; exhaustion throws") {
    withServer(failWrites = 2) { (url, reqs) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 3, retryBackoffMs = 10))
      assert(w.open(0, 0))
      w.process(row("m", 1L, Map("v" -> "1"))) // 503, 503, then 204
      w.close(null)
      assert(reqs.synchronized(reqs.size) == 1, "the retried batch lands once")
    }
    withServer(failWrites = 100) { (url, _) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 1, retryBackoffMs = 10))
      assert(w.open(0, 0))
      val e = intercept[RuntimeException](w.process(row("m", 1L, Map("v" -> "1"))))
      assert(e.getMessage.contains("after 2 attempts"), e.getMessage)
    }
    // 4xx is permanent (bad line protocol / auth): no retries, fail fast
    withServer(failWrites = 100, failStatus = 400) { (url, _) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 5, retryBackoffMs = 10))
      assert(w.open(0, 0))
      val t0 = System.nanoTime()
      val e = intercept[RuntimeException](w.process(row("m", 1L, Map("v" -> "1"))))
      assert(e.getMessage.contains("not retryable"), e.getMessage)
      assert((System.nanoTime() - t0) / 1e6 < 5000, "must not sit in backoff sleeps")
    }
  }

  test("x06: circuit breaker — opens after N consecutive failures, half-open probe closes it") {
    // open-state assertions use a LONG window (a GC pause on the shared box
    // must not turn the fast-fail check into an accidental half-open probe)
    val hits = new java.util.concurrent.atomic.AtomicInteger
    withServer(failWrites = 2, writeHits = hits) { (url, _) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 0, retryBackoffMs = 1, breakerFailures = 2, breakerOpenMs = 120000))
      assert(w.open(0, 0))
      // two failed flushes (one POST each, maxRetries=0) trip the breaker
      intercept[RuntimeException](w.process(row("m", 1L, Map("v" -> "1"))))
      intercept[RuntimeException](w.process(row("m", 2L, Map("v" -> "2"))))
      assert(hits.get == 2)
      // open: immediate failure, the endpoint is NOT touched
      val e = intercept[RuntimeException](w.process(row("m", 3L, Map("v" -> "3"))))
      assert(e.getMessage.contains("circuit open"), e.getMessage)
      assert(hits.get == 2, "open breaker must not hit the endpoint")
    }
    // the half-open transition uses a SHORT window + a sleep beyond it (an
    // extra-long pause only makes the probe later, never earlier)
    val hitsP = new java.util.concurrent.atomic.AtomicInteger
    withServer(failWrites = 1, writeHits = hitsP) { (url, reqs) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 0, retryBackoffMs = 1, breakerFailures = 1, breakerOpenMs = 300))
      assert(w.open(0, 0))
      intercept[RuntimeException](w.process(row("m", 1L, Map("v" -> "1")))) // trips
      Thread.sleep(350)
      // window elapsed + server healthy again: the half-open probe posts the
      // accumulated batch, succeeds, and CLOSES the breaker
      w.process(row("m", 2L, Map("v" -> "2")))
      assert(hitsP.get == 2)
      w.process(row("m", 3L, Map("v" -> "3")))
      assert(hitsP.get == 3, "closed breaker must flow normally")
      assert(reqs.synchronized(reqs.size) == 2)
    }
    // a 4xx during the half-open probe CLOSES the breaker (the endpoint
    // answered — it is reachable) instead of wedging `probing` forever;
    // the probe request itself still fails permanently
    val hits4 = new java.util.concurrent.atomic.AtomicInteger
    withServer(writeHits = hits4, statusSeq = Seq(503, 400)) { (url, _) =>
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 0, retryBackoffMs = 1, breakerFailures = 1, breakerOpenMs = 200))
      assert(w.open(0, 0))
      intercept[RuntimeException](w.process(row("m", 1L, Map("v" -> "1")))) // 503: trips
      Thread.sleep(250)
      val e = intercept[RuntimeException](w.process(row("m", 2L, Map("v" -> "2")))) // probe → 400
      assert(e.getMessage.contains("not retryable"), e.getMessage)
      assert(hits4.get == 2)
      // breaker must now be CLOSED: the next flush reaches the endpoint
      // immediately (scripted statuses exhausted → 204) and succeeds
      w.process(row("m", 3L, Map("v" -> "3")))
      assert(hits4.get == 3, "4xx probe must close the breaker, not wedge it open")
    }
    // a FAILED half-open probe re-opens the window (single attempt, then
    // back to immediate failures)
    val hits2 = new java.util.concurrent.atomic.AtomicInteger
    withServer(failWrites = 100, writeHits = hits2) { (url, _) =>
      // window wide enough that the post-probe "still open" assertion can't
      // be outrun by a scheduling pause, but short enough to sleep past
      val w = new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1,
        maxRetries = 0, retryBackoffMs = 1, breakerFailures = 1, breakerOpenMs = 5000))
      assert(w.open(0, 0))
      intercept[RuntimeException](w.process(row("m", 1L, Map("v" -> "1"))))
      Thread.sleep(5100)
      val before = hits2.get
      intercept[RuntimeException](w.process(row("m", 2L, Map("v" -> "2")))) // probe: one POST
      assert(hits2.get == before + 1)
      val e = intercept[RuntimeException](w.process(row("m", 3L, Map("v" -> "3"))))
      assert(e.getMessage.contains("circuit open"), e.getMessage)
      assert(hits2.get == before + 1, "re-opened breaker must not hit the endpoint")
    }
  }

  test("x04: streaming end-to-end — foreach(InfluxHttpWriter) posts every window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    withServer() { (url, reqs) =>
      val in = MemoryStream[String]
      val pts = graft.streaming.TweetPipelines.perSecondCounts(
          graft.streaming.TweetPipelines.withLateness(
            graft.streaming.TweetPipelines.parse(in.toDF())))
        .select(lit("TweetPerSecondCountFlink").as("measurement"),
          unix_millis(col("window_end")).as("time_ms"),
          map(lit("count"), col("cnt").cast("string")).as("fields"))
      val q = pts.writeStream.outputMode("append")
        .foreach(new InfluxHttpWriter(InfluxHttpConfig(url, batchActions = -1)))
        .start()
      try {
        in.addData(s"""{"text":"a","createdAt":1100,"lang":"en"}""",
          s"""{"text":"b","createdAt":1500,"lang":"en"}""")
        q.processAllAvailable()
        in.addData(s"""{"text":"adv","createdAt":400000,"lang":"en"}""")
        q.processAllAvailable()
        in.addData(s"""{"text":"flush","createdAt":800000,"lang":"en"}""")
        q.processAllAvailable()
        val lines = reqs.synchronized(reqs.toVector).flatMap(_.body.linesIterator)
        assert(lines.contains("TweetPerSecondCountFlink count=\"2\" 2000000000"),
          s"got $lines")
      } finally q.stop()
    }
  }
}
