package graft

import graft.operators.{TierFour, TierTwelve}

/** Tier-12 round-7 widening: properties the DuckDB oracle can't express —
  * brute-force differentials computed in Scala, screen-containment laws,
  * and the plan gates that keep the new queries off the scale-killer list.
  */
class TierTwelveSpec extends SparkSpec {

  private def simhashes: Array[(Long, Long)] =
    TierFour.simhashSigs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))

  test("q94 sorted-neighborhood ≡ brute force (rank window computed in Scala)") {
    val ranked = simhashes.sortBy { case (id, sig) => (sig, id) }
    val expected = (for {
      i <- ranked.indices.iterator
      j <- (i + 1) to math.min(i + 5, ranked.length - 1)
      d = java.lang.Long.bitCount(ranked(i)._2 ^ ranked(j)._2)
      if d <= 3
    } yield {
      val (a, b) = (ranked(i)._1, ranked(j)._1)
      (math.min(a, b), math.max(a, b), d.toLong)
    }).toSet
    val got = TierTwelve.q94.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must exercise the neighborhood")
  }

  test("q94 is a screen: every reported pair is a true Hamming ≤ 3 pair " +
    "and every EQUAL-signature pair within the window is caught") {
    val sigOf = simhashes.toMap
    val rows = TierTwelve.q94.run(spark, sf).collect()
    rows.foreach { r =>
      val d = java.lang.Long.bitCount(sigOf(r.getLong(0)) ^ sigOf(r.getLong(1)))
      assert(d.toLong == r.getLong(2) && d <= 3)
    }
    // recall floor on the exact-duplicate core: identical signatures sort
    // adjacent, so any equal-sig pair ≤ 5 ranks apart MUST be reported
    val bySig = simhashes.groupBy(_._2).filter(_._2.length > 1)
    val reported = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    bySig.values.foreach { grp =>
      val ids = grp.map(_._1).sorted
      if (grp.length <= 6)
        ids.combinations(2).foreach { case Array(a, b) =>
          assert(reported((a, b)), s"equal-sig pair ($a,$b) missed")
        }
    }
  }

  test("q94/q95 plans: no CartesianProduct; q94 rank fully distributed; " +
    "q95 query side broadcast") {
    Seq(TierTwelve.q94, TierTwelve.q95).foreach { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(600)}")
    }
    // the SNM rank is the two-pass prefix count — nothing funnels to one task
    val p94 = TierTwelve.q94.run(spark, sf).queryExecution.executedPlan.toString
    assert(!p94.contains("Exchange SinglePartition"), p94.take(600))
    // q95: the whole-document query vector rides broadcasts; the only
    // single-partition exchange permitted is the 1-row corpus-count total
    // (bounded by construction, the q51 convention)
    val p95 = TierTwelve.q95.run(spark, sf).queryExecution.executedPlan.toString
    assert(p95.contains("BroadcastHashJoin"), p95.take(600))
    val spLines = p95.linesIterator.filter(_.contains("Exchange SinglePartition"))
    assert(spLines.size <= 1, p95.take(600))
  }

  test("q95 lexical kNN ≡ brute force (integer tf-idf computed in Scala)") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val n = docs.length.toLong
    val tf = docs.map { case (id, toks) =>
      id -> toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = docs.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val q = tf(0L)
    val expected = docs.iterator.filter(_._1 != 0L).map { case (id, _) =>
      id -> q.iterator.map { case (t, tfq) =>
        tf(id).getOrElse(t, 0L) * tfq * ((n * 1000000L) / df(t))
      }.sum
    }.filter(_._2 > 0).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = TierTwelve.q95.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  test("q96 decontamination bitmask ≡ brute force and bit 0 ≡ q93's hit set") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    def has(toks: Array[String], ph: Seq[String]) =
      toks.length >= ph.length && toks.sliding(ph.length).exists(_.sameElements(ph))
    val expected = docs.iterator.map { case (id, toks) =>
      val mask = (if (has(toks, Seq("window", "hash"))) 1L else 0L) |
        (if (has(toks, Seq("spark", "window"))) 2L else 0L)
      id -> mask
    }.filter(_._2 > 0).toSeq.sortBy(_._1)
    val got = TierTwelve.q96.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    assert(expected.exists(m => (m._2 & 1L) != 0), "phrase 0 must hit")
    // bit 0 of the mask is exactly q93's per-doc hit set
    val q93Docs = TierTwelve.q93.run(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got.filter(m => (m._2 & 1L) != 0).map(_._1).toSet == q93Docs)
  }
}
