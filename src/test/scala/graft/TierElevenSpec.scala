package graft

import graft.operators.TierEleven
import org.apache.spark.sql.functions._

/** Tier-11 retrieval/model-apply operators: brute-force differentials in
  * plain Scala (independent of both engines), recall measurements for the
  * kNN join, and plan gates.
  */
class TierElevenSpec extends SparkSpec {

  private val P = 2147483647L
  private val A0 = 2654435761L
  private val B0 = 40503L

  private lazy val docToks: Array[(Long, Array[String])] =
    Tables.load(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))

  test("q82 BM25 ≡ plain-Scala brute force (scores, ranking, cut)") {
    val n = docToks.length.toLong
    val totalToks = docToks.map(_._2.length.toLong).sum
    val avgdl = totalToks / n
    val terms = Seq("spark", "window", "hash")
    val dfm = terms.map(t => t -> docToks.count(_._2.contains(t)).toLong).toMap
    val scored = docToks.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val matched = terms.map(t => t -> toks.count(_ == t).toLong).filter(_._2 > 0L)
      // membership = "contains a query term" (both engines emit a row even
      // when the integer score truncates to 0), NOT "score > 0"
      if (matched.isEmpty) None
      else Some(id -> matched.map { case (t, tf) =>
        val idf = (n * 1000000L) / dfm(t)
        val norm = 250L + (750L * ((dl * 1000L) / avgdl)) / 1000L
        (tf * 2200L * idf) / (tf * 1000L + (1200L * norm) / 1000L)
      }.sum)
    }
    val expect = scored.sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = TierEleven.q82.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expect)
  }

  test("q82 plan: query terms and totals broadcast, no CartesianProduct") {
    val plan = TierEleven.q82.run(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q83 classifier ≡ plain-Scala hashed-feature scoring") {
    // both engines order strings by raw UTF-8 bytes; Scala's default sort
    // is UTF-16 code-unit order, which diverges for supplementary-plane
    // text — sort the brute force the way the engines do
    val vocab = docToks.flatMap(_._2).distinct
      .sortWith { (a, b) =>
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      }
      .zipWithIndex.map { case (t, i) => t -> (i + 1).toLong }.toMap
    def bucket(tid: Long): Long = ((tid % P) * A0 + B0) % P % 4096L
    def w(b: Long): Long = ((b * A0 + B0) % P) % 2001L - 1000L
    val expect = docToks.map { case (id, toks) =>
      val s = toks.map(t => w(bucket(vocab(t)))).sum
      (id, s, if (s >= 0L) "keep" else "drop")
    }.sortBy(_._1).toSeq
    val got = TierEleven.q83.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expect)
    // a filter must actually split the corpus to mean anything
    assert(got.exists(_._3 == "keep") && got.exists(_._3 == "drop"))
  }

  test("q84 normalization restores every fixture row and is idempotent") {
    val rows = TierEleven.q84.run(spark, sf).collect()
    assert(rows.length == docToks.length)
    assert(rows.forall(_.getLong(3) == 1L), "every injected row round-trips")
    // noise really was injected: wrapped/padded/doubled rows grew
    assert(rows.count(r => r.getLong(1) > r.getLong(2)) > rows.length / 2)
    // idempotence: cleaning already-clean text is the identity
    def clean(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "  +", " "))
    val twice = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), clean(clean(col("text"))).as("c2"),
        clean(col("text")).as("c1"))
      .filter(col("c1") =!= col("c2"))
    assert(twice.isEmpty)
  }

  private lazy val embs: Array[(Long, Array[Double])] =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

  /** Exact global top-1 neighbor by cosine, the recall truth. */
  private lazy val globalTop1: Map[Long, Long] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    embs.map { case (id, v) =>
      id -> embs.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .maxBy { case (j, c) => (c, -j) }._1
    }.toMap
  }

  test("q85 kNN join: measured recall vs exact top-1; 2nd probe widens it") {
    val got1 = TierEleven.knnJoin(spark, sf, probe2 = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got2 = TierEleven.knnJoin(spark, sf, probe2 = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = embs.length
    def recall(m: Map[Long, Long], ids: Iterable[Long]): Double =
      ids.count(i => m.get(i).contains(globalTop1(i))).toDouble / ids.size
    val r1 = recall(got1, embs.map(_._1))
    val r2 = recall(got2, embs.map(_._1))
    assert(got1.size == n && got2.size == n)
    // deterministic fixture → deterministic floors (measured 0.446 / 0.738)
    assert(r1 >= 0.44, s"single-probe recall $r1")
    assert(r2 >= 0.73, s"two-probe recall $r2")
    assert(r2 > r1, s"widening must help: $r1 -> $r2")
  }

  test("q85 near-dup regime (neighbor cos ≥ 0.45): single-probe recall ≥ 0.7") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val byId = embs.toMap
    val strong = embs.map(_._1).filter { i =>
      cos(byId(i), byId(globalTop1(i))) >= 0.45
    }
    assert(strong.nonEmpty)
    val got = TierEleven.knnJoin(spark, sf, probe2 = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = strong.count(i => got.get(i).contains(globalTop1(i))).toDouble / strong.size
    assert(r >= 0.7, s"near-dup regime recall $r over ${strong.size} vectors")
  }

  test("q86 PII redaction: counts follow the injection arithmetic; masks are complete") {
    val rows = TierEleven.q86.run(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L), s"email count @$id")
      assert(r.getLong(2) == (if (id % 4 == 0) 1L else 0L), s"phone count @$id")
      assert(r.getLong(3) == (if (id % 5 == 0) 1L else 0L), s"ip count @$id")
      val red = r.getString(4)
      assert(!red.contains("@"), s"unmasked email @$id")
      assert(!red.matches(".*[0-9]{3}-[0-9]{3}-[0-9]{4}.*"), s"unmasked phone @$id")
      assert(!red.matches(".*[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+.*"), s"unmasked ip @$id")
    }
    // rows with no injected PII pass through byte-identical
    val texts = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter { r =>
      val id = r.getLong(0); id % 3 != 0 && id % 4 != 0 && id % 5 != 0
    }.foreach(r => assert(r.getString(4) == texts(r.getLong(0))))
  }

  test("q88 retention ≡ plain-Scala brute force; matrix invariants hold") {
    val events = Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_millis(cast(ts as timestamp))"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400000L))
    val byUser = events.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = byUser.toSeq.flatMap { case (_, days) =>
      val cohort = days.min
      days.toSeq.map(d => (cohort, d - cohort))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TierEleven.q88.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // invariants: every cohort has its day-0 cell, and no later cell exceeds it
    val cohorts = got.keys.map(_._1).toSet
    cohorts.foreach { c =>
      val day0 = got((c, 0L))
      assert(got.collect { case ((`c`, k), n) if k > 0 => n }.forall(_ <= day0),
        s"cohort $c retains more users than it started with")
    }
  }

  test("q89 repeated spans ≡ plain-Scala brute force; injected tails all found") {
    val tail = TierEleven.spanTail
    val docs = docToks.map { case (id, toks) =>
      id -> (if (id % 7 == 0) toks ++ tail.trim.split(" ") else toks)
    }
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val shingles = docs.map { case (id, l) =>
      id -> (0 to l.length - 8).map { p =>
        val s = l.slice(p, p + 8).mkString(" ")
        counts(s) = counts.getOrElse(s, 0) + 1
        (p, s)
      }
    }
    val expect = shingles.flatMap { case (id, sh) =>
      val flagged = sh.collect { case (p, s) if counts(s) >= 2 => p }
      // islands: consecutive flagged positions
      val spans = flagged.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      spans.map { case (s0, e0) => (id, s0.toLong, (e0 - s0 + 8).toLong) }
        .filter(_._3 >= 16L)
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = TierEleven.q89.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // every injected doc's boilerplate tail must surface as (part of) a span
    val tailLen = tail.trim.split(" ").length
    docs.filter(_._1 % 7 == 0).foreach { case (id, l) =>
      val tailStart = l.length - tailLen
      assert(got.exists { case (d, s0, len) =>
        d == id && s0 <= tailStart && s0 + len >= l.length
      }, s"doc $id: injected boilerplate tail not covered by any span")
    }
  }

  test("q90 span strip executes exactly q89's cut list") {
    val tail = TierEleven.spanTail
    val noisy = docToks.map { case (id, toks) =>
      id -> (if (id % 7 == 0) toks ++ tail.trim.split(" ") else toks)
    }.toMap
    val spans = TierEleven.q89.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // token-space spans can OVERLAP (islands < 8 flagged positions apart
    // both extend +8), so coverage is the UNION of ranges, not the sum
    val cutByDoc = spans.groupBy(_._1).view.mapValues(
      _.flatMap { case (_, s0, len) => s0 until (s0 + len) }.toSet.size.toLong).toMap
    val rows = TierEleven.q90.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == noisy.size, "every document appears in the output")
    rows.foreach { case (id, clean, removed) =>
      // islands are disjoint, so removal count = sum of the doc's span lens
      assert(removed == cutByDoc.getOrElse(id, 0L), s"cut arithmetic @$id")
      val keptToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ")
      assert(keptToks.length + removed == noisy(id).length, s"token conservation @$id")
      if (removed == 0L) assert(clean == noisy(id).mkString(" "), s"uncut doc changed @$id")
    }
    // the strip is real: injected docs lose at least their boilerplate tail
    val tailLen = tail.trim.split(" ").length
    noisy.keys.filter(_ % 7 == 0).foreach { id =>
      assert(rows.find(_._1 == id).get._3 >= tailLen, s"tail not stripped @$id")
    }
  }

  test("span assembly ≡ brute force on 20 seeded random corpora") {
    // the islands logic saw one fixture shape through the oracle; drive it
    // with adversarial synthetic corpora — tiny vocab (dense repeats),
    // short docs (guard edges), long runs (overlapping token-space spans)
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 20).foreach { trial =>
      val vocabSize = 1 + rnd.nextInt(5) // 1..5 tokens → heavy repetition
      val docs = (0 until (3 + rnd.nextInt(8))).map { id =>
        val len = rnd.nextInt(40) // 0..39 tokens, some below shingle width
        (id.toLong, Array.fill(len)(s"w${rnd.nextInt(vocabSize)}"))
      }
      val got = TierEleven.spansOf(
          docs.map { case (id, l) => (id, l.toSeq) }.toDF("doc_id", "l"))
        .collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
          r.getAs[Number](2).longValue()))
        .toSet
      val counts = scala.collection.mutable.Map.empty[String, Int]
      val shingled = docs.map { case (id, l) =>
        id -> (0 to l.length - 8).map { p =>
          val s = l.slice(p, p + 8).mkString(" ")
          counts(s) = counts.getOrElse(s, 0) + 1
          (p, s)
        }
      }
      val expect = shingled.flatMap { case (id, sh) =>
        val flagged = sh.collect { case (p, s) if counts(s) >= 2 => p }
        flagged.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.map { case (s0, e0) => (id, s0.toLong, (e0 - s0 + 8).toLong) }
          .filter(_._3 >= 16L)
      }.toSet
      assert(got == expect, s"trial $trial (vocab $vocabSize): $got vs $expect")
    }
  }

  test("q91 temperature mix upsamples low-resource languages (and only them)") {
    val rows = TierEleven.q91.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val total = rows.map(_._2).sum
    // shares sum to ~1e6 (integer div truncation loses < |langs| ppm)
    val shareSum = rows.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length, s"sum $shareSum")
    // the formula's purpose: sqrt flattens the distribution. The share/raw
    // crossover sits at (Σn/Σ√n)² — ≥ the mean by Cauchy-Schwarz — so the
    // provable directions are: every below-MEAN language gains share, and
    // the largest language cedes (strictly, once counts differ at all)
    val distinctCounts = rows.map(_._2).distinct.length
    assert(distinctCounts > 1, "fixture must have imbalanced languages")
    val nMax = rows.map(_._2).max
    rows.foreach { case (lang, n, share) =>
      val rawPpm = n * 1000000L / total
      if (n * rows.length < total) // below mean < crossover
        assert(share > rawPpm, s"$lang under-sampled: $share <= $rawPpm")
      if (n == nMax) // max is provably above the crossover
        assert(share < rawPpm, s"$lang not flattened: $share >= $rawPpm")
    }
    // determinism: re-run bit-identical (sqrt is IEEE-correctly-rounded)
    assert(TierEleven.q91.run(spark, sf).collect().toSeq ==
      TierEleven.q91.run(spark, sf).collect().toSeq)
  }

  test("q85 plan: centroid assignment broadcasts, no CartesianProduct") {
    val plan = TierEleven.q85.run(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }
}
