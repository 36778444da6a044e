package graft

import graft.operators.TierSeventeen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Tier-17 differentials: q117 against an independent in-memory span
  * corruptor (hash constants restated literally) plus the round-trip law
  * (input + target reconstruct the document exactly); q118 against
  * brute-force integer schedule arithmetic; plan gates; s31 streaming
  * corruption parity.
  */
class TierSeventeenSpec extends SparkSpec {
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val P = 2147483647L
  private val A0 = 2654435761L
  private val B0 = 40503L

  private def corpus: Seq[(Long, String)] =
    Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  /** Independent corruptor: explicit start set → island scan → builds. */
  private def brute(id: Long, text: String): (String, String, Long, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val n = toks.length
    val masked = Array.fill(n)(false)
    (0 until n).foreach { p =>
      if ((((id * 131071L + p) % P) * A0 + B0) % P % 20 == 0)
        (p until math.min(p + 3, n)).foreach(masked(_) = true)
    }
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < n) {
      if (masked(i)) { var j = i; while (j < n && masked(j)) j += 1; spans += ((i, j)); i = j }
      else i += 1
    }
    val inp = (0 until n).flatMap { p =>
      if (!masked(p)) Some(toks(p))
      else spans.indexWhere(_._1 == p) match {
        case -1 => None
        case k  => Some(s"<extra_id_$k>")
      }
    }.mkString(" ")
    val tgt = spans.zipWithIndex.map { case ((a, b), k) =>
      (s"<extra_id_$k>" +: toks.slice(a, b)).mkString(" ")
    }.mkString(" ")
    (inp, tgt, spans.size.toLong, masked.count(identity).toLong)
  }

  test("q117 span corruption ≡ independent in-memory corruptor (real corpus)") {
    val expected = corpus.map { case (id, text) =>
      val (i, t, s, m) = brute(id, text); (id, i, t, s, m)
    }
    val got = TierSeventeen.q117.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    // the corruptor must actually corrupt (and not everything)
    assert(got.exists(_._4 > 0) && got.exists(g => g._5 < g._2.split(" ").length))
    // corruption rate lands near the 15% design point (3/20) corpus-wide
    val totTok = corpus.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
    val totMasked = got.map(_._5).sum
    assert(totMasked * 100 / totTok >= 10 && totMasked * 100 / totTok <= 20,
      s"corpus mask rate ${totMasked}/$totTok outside [10%,20%]")
  }

  test("q117 round-trip law: input + target reconstruct every document") {
    val sentinel = "<extra_id_(\\d+)>".r
    TierSeventeen.q117.run(spark, sf).collect().foreach { r =>
      val (id, inp, tgt) = (r.getLong(0), r.getString(1), r.getString(2))
      // parse target into sentinel-indexed buckets
      val buckets = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      tgt.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; buckets(cur) = Vector()
        case t           => buckets(cur) = buckets(cur) :+ t
      }
      val rebuilt = inp.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => buckets(k.toInt)
        case t           => Vector(t)
      }.mkString(" ")
      val original = corpus.find(_._1 == id).get._2.split(" ").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == original, s"doc $id failed round trip")
    }
  }

  test("q118 epoch plan ≡ brute-force schedule arithmetic; targets sum to ≤ 1e6") {
    val docs = Tables.load(spark, sf, "documents").select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").count(_.nonEmpty).toLong))
    val byLang = docs.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val wt = byLang.view.mapValues { case (nd, _) =>
      math.round(math.sqrt(nd.toDouble) * 1000000)
    }.toMap
    val totalWt = wt.values.sum
    val totalTok = byLang.values.map(_._2).sum
    val expected = byLang.toSeq.sortBy(_._1).map { case (lang, (nd, nt)) =>
      val target = wt(lang) * 1000000L / totalWt
      val actual = nt * 1000L / totalTok
      (lang, nd, nt, target, actual, target * 1000L / actual)
    }
    val got = TierSeventeen.q118.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == expected)
    assert(got.map(_._4).sum <= 1000000L)
    // the temperature mix must upsample at least one low-resource language
    assert(got.exists(_._6 > 1000000L) && got.exists(_._6 < 1000000L))
  }

  test("tier-17 plan gates: no CartesianProduct; q117 no single-partition exchange") {
    for (q <- Seq(TierSeventeen.q117, TierSeventeen.q118)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(800)}")
    }
    // q118's one SinglePartition is the scalar-total agg (q46/q51 shape);
    // q117 has no global total, so its plan must stay fully partitioned
    val plan = TierSeventeen.q117.run(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), s"q117: ${plan.take(800)}")
  }

  test("s31: span corruption on a stream ≡ batch q117 (stateless per-doc generation)") {
    import spark.implicits._
    val batch = TierSeventeen.q117.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    val acc = scala.collection.mutable.Map.empty[Long, (String, String, Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        TierSeventeen.spanCorrupt(df).collect().foreach(r =>
          acc(r.getLong(0)) = (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        ()
      }.start()
    try {
      corpus.grouped(120).foreach { c => in.addData(c); q.processAllAvailable() }
      assert(acc.toMap == batch)
      assert(acc.nonEmpty)
    } finally q.stop()
  }
}
