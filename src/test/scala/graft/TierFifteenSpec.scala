package graft

import graft.operators.{TierFifteen, TierFive, TierNine}

/** Tier-15 differentials against independent brute force on the real
  * corpus/embeddings, plus plan gates: q106's rules recomputed naively in
  * Scala; q107's vote against an exact in-memory kNN; q108's celled pairs
  * against (brute-force pairs ∩ same-cell) with the straddle accounting
  * that explains every q35 pair the celled plan misses.
  */
class TierFifteenSpec extends SparkSpec {

  private val stop = Set("the", "a", "of", "and", "to", "in")

  test("q106 gopher rules ≡ brute-force integer rule battery (real corpus)") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.toSeq.sortBy(_._1).map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val n = toks.length.toLong
      val d = toks.distinct.length.toLong
      val maxTf = if (n == 0) 0L else toks.groupBy(identity).values.map(_.length).max.toLong
      val chars = toks.map(_.length.toLong).sum
      val nStop = toks.distinct.count(stop).toLong
      val rCount = if (n >= 50 && n <= 100000) 1L else 0L
      val rMean = if (n > 0 && 3 * n <= chars && chars <= 10 * n) 1L else 0L
      val rStop = if (nStop >= 2) 1L else 0L
      val rTtr = if (n > 0 && 10 * d >= 3 * n) 1L else 0L
      val rTop = if (n > 0 && 5 * maxTf <= n) 1L else 0L
      (id, n, rCount, rMean, rStop, rTtr, rTop, rCount * rMean * rStop * rTtr * rTop)
    }
    val got = TierFifteen.q106.run(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    // the battery must discriminate on this corpus — some admitted, some not
    assert(got.exists(_._8 == 1L) && got.exists(_._8 == 0L))
  }

  private def vectors: Map[Long, (Long, Array[Double])] =
    Tables.load(spark, sf, "embeddings").collect().map { r =>
      val e = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
      r.getLong(0) -> (r.getAs[Int]("label").toLong, e)
    }.toMap

  private def sq(a: Array[Double], b: Array[Double]): Double = {
    // the dot-identity form the queries use (NOT Σ(x−y)² — must match the
    // engine's float math bit for bit)
    def dot(x: Array[Double], y: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }; s
    }
    dot(a, a) - 2 * dot(a, b) + dot(b, b)
  }

  test("q107 kNN vote ≡ exact in-memory 5-NN majority (real embeddings)") {
    val v = vectors
    val expected = v.toSeq.sortBy(_._1).map { case (id, (label, e)) =>
      val top = v.toSeq.filter(_._1 != id)
        .map { case (nb, (nbl, f)) => (sq(e, f), nb, nbl) }
        .sortBy(t => (t._1, t._2)).take(5)
      val votes = top.groupBy(_._3).toSeq.map { case (l, g) => (-g.size.toLong, l) }
      val pred = votes.min._2
      (id, label, pred, if (label == pred) 1L else 0L)
    }
    val got = TierFifteen.q107.run(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // sanity: one verdict per vector; votes are not degenerate (the fixture's
    // labels are near-random w.r.t. geometry — accuracy ≈ 1/k — so the audit
    // value here is the DISAGREEMENT signal, and the gate is distributional)
    assert(got.size == v.size)
    assert(got.map(_._3).distinct.size > 1, "all predictions collapsed to one label")
  }

  test("q108 celled pairs ≡ same-cell brute force; misses vs q35 are exactly the straddlers") {
    val v = vectors
    val cell = TierFifteen.cellAssignment(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cid")).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val ids = v.keys.toSeq.sorted
    val all = for {
      i <- ids; j <- ids if i < j
      c = cos(v(i)._2, v(j)._2) if c >= 0.45
    } yield (i, j, c)
    val expected = all.filter { case (i, j, _) => cell(i) == cell(j) }
      .map { case (i, j, c) =>
        (i, j, cell(i), BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(t => (t._1, t._2))
    val got = TierFifteen.q108.run(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // recall accounting: every q35 pair absent here straddles two cells
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    val missed = all.filter { case (i, j, _) => !gotPairs((i, j)) }
    assert(missed.forall { case (i, j, _) => cell(i) != cell(j) })
    assert(gotPairs.nonEmpty, "celled candidate set must be non-empty")
  }

  test("q108 pairs ⊆ q35 pairs with identical rounded cosine") {
    val q35 = TierFive.q35.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = TierFifteen.q108.run(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    assert(got.forall { case (p, c) => q35.get(p).contains(c) })
  }

  test("q109 3-round training: objective non-increasing vs 1 round; sizes account for every vector") {
    val v = vectors
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }; s
    }
    def inertia(cents: Seq[Array[Double]]): Double =
      v.values.map { case (_, e) => cents.map(c => d2(e, c)).min }.sum
    val emb = graft.operators.TierNine.embOf(spark, sf)
    val round1 = graft.operators.IvfStore.train(emb, 4).collect()
      .map(_.getSeq[Double](1).toArray).toSeq
    val got = TierFifteen.q109.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).sum == v.size, "every vector assigned exactly once")
    // re-derive round-3 centroids through the library step calls and check
    // the k-means objective kept moving down (ties allowed: 6-dp rounding)
    import spark.implicits._
    var cents = round1
    for (_ <- 2 to 3) {
      val frozen = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "c")
      // cid relabeling is irrelevant to the objective
      cents = graft.operators.IvfStore.step(emb, frozen).collect()
        .map(_.getSeq[Double](1).toArray).toSeq
    }
    assert(inertia(cents) <= inertia(round1) * 1.0000001,
      s"3-round inertia ${inertia(cents)} vs 1-round ${inertia(round1)}")
    // the convergence witness rides the output: c0 is a real 6-dp centroid
    // component of the final round
    val c0s = cents.map(c => c.head).toSet
    assert(got.forall(r => c0s.contains(r._3)), s"${got.toSeq} vs $c0s")
  }

  test("q110 BPE encode ≡ reference greedy merge scan (real corpus + learned merges)") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // learn merges exactly as q99: char-pair weight = sum of word freq
    val wf = scala.collection.mutable.Map.empty[String, Long]
    for ((_, t) <- docs; w <- t.split(" ") if w.nonEmpty)
      wf(w) = wf.getOrElse(w, 0L) + 1
    val pc = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((w, f) <- wf; i <- 0 until w.length - 1) {
      val k = (w.substring(i, i + 1), w.substring(i + 1, i + 2))
      pc(k) = pc.getOrElse(k, 0L) + f
    }
    val merges = pc.toSeq.sortBy { case ((a, b), wt) => (-wt, a, b) }.take(20).map(_._1)
    // reference BPE encode: leftmost-first non-overlapping scan per merge
    def encWord(w: String): Seq[String] = {
      var syms: Seq[String] = w.map(_.toString)
      for ((a, b) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    val expected = docs.toSeq.sortBy(_._1).map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val nb = ws.map(_.length.toLong).sum
      val na = ws.map(w => encWord(w).length.toLong).sum
      (id, nb, na, if (nb == 0) 0L else na * 1000000 / nb)
    }
    val got = TierFifteen.q110.run(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // merges must actually compress on this corpus
    assert(got.exists(r => r._3 < r._2))
  }

  test("q111 split drift ≡ brute-force ppm arithmetic (real corpus, q75 split rule)") {
    val P = 2147483647L; val A0 = 2654435761L; val B0 = 40503L
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val cnt = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var (tTrain, tValid) = (0L, 0L)
    for ((id, t) <- docs) {
      val bkt = ((id % P) * A0 + B0) % P % 1000
      if (bkt < 990) {
        val isTrain = bkt < 980
        for (w <- t.split(" ") if w.nonEmpty) {
          val (a, b) = cnt.getOrElse(w, (0L, 0L))
          cnt(w) = if (isTrain) (a + 1, b) else (a, b + 1)
          if (isTrain) tTrain += 1 else tValid += 1
        }
      }
    }
    val expected = cnt.toSeq.map { case (w, (a, b)) =>
      val pt = a * 1000000 / tTrain; val pv = b * 1000000 / tValid
      (w, pt, pv, pt - pv)
    }.sortBy(r => (-math.abs(r._4), r._1)).take(20)
    val got = TierFifteen.q111.run(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._4 != 0L), "fixture must show some drift")
  }

  test("cellVote (IVF-celled 5-NN vote) agrees with the brute-force q107 anchor on most vectors") {
    val brute = TierFifteen.q107.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val celled = TierFifteen.cellVote(spark, sf, probe2 = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(celled.keySet == brute.keySet, "every vector voted")
    val agree = celled.count { case (id, p) => brute(id) == p }.toDouble / brute.size
    // measured 0.574 two-probe on this fixture (near-random labels make the
    // vote knife-edged: one displaced neighbor flips a tie) — the floor pins
    // the recall regression the way AnnRecallSpec does, just under measured
    assert(agree >= 0.55, s"celled-vote agreement $agree below measured floor")
    // measured 0.338 single-probe: the second probe lifts agreement by
    // ~24 points on this fixture — the widening must keep strictly winning
    val single = TierFifteen.cellVote(spark, sf, probe2 = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agreeSingle = single.count { case (id, p) => brute(id) == p }.toDouble / brute.size
    info(s"agreement: single-probe $agreeSingle, two-probe $agree")
    assert(agreeSingle < agree, s"single $agreeSingle vs two-probe $agree")
    assert(agreeSingle >= 0.30, s"single-probe agreement $agreeSingle collapsed")
  }

  test("tier-15 plans: no CartesianProduct; q106/q108 no single-partition exchange") {
    for (q <- Seq(TierFifteen.q106, TierFifteen.q107, TierFifteen.q108)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(600)}")
    }
    // q107 is the documented O(n²) BNLJ anchor (q24/q35 posture); the other
    // two must also be exchange-clean
    for (q <- Seq(TierFifteen.q106, TierFifteen.q108)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"), s"${q.name}: ${plan.take(600)}")
    }
  }
}
