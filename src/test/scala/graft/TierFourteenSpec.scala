package graft

import graft.operators.TierFourteen

/** Tier-14 cross-document span dedup against independent brute force on
  * the real corpus, plus the plan gates the 100 TB posture requires
  * (no cartesian, no single-partition exchange, islands window partitioned
  * by doc).
  */
class TierFourteenSpec extends SparkSpec {

  private val W = 8

  private def corpus: Map[Long, Array[String]] =
    Tables.load(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  /** key → distinct docs holding it (brute force). */
  private def keyDocs(c: Map[Long, Array[String]]): Map[String, Set[Long]] = {
    val b = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, l) <- c; i <- 0 to l.length - W) {
      val k = l.slice(i, i + W).mkString(" ")
      b(k) = b.getOrElse(k, Set.empty) + id
    }
    b.toMap
  }

  private def mergeSpans(starts: Seq[Int]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (s <- starts.sorted) {
      val e = s + W - 1
      if (out.nonEmpty && s <= out.last._2 + 1)
        out(out.length - 1) = (out.last._1, math.max(out.last._2, e))
      else out += ((s.toLong, e.toLong))
    }
    out.toSeq
  }

  test("q101 spans ≡ brute-force cross-doc shingle islands (real corpus)") {
    val c = corpus
    val kd = keyDocs(c)
    val expected = (for ((id, l) <- c.toSeq) yield {
      val starts = (0 to l.length - W).filter { i =>
        kd(l.slice(i, i + W).mkString(" ")).size >= 2
      }
      mergeSpans(starts).map { case (s, e) => (id, s, e) }
    }).flatten.sortBy(t => (t._1, t._2))
    val got = TierFourteen.q101.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "corpus must contain cross-doc repeats")
  }

  test("q102 strip ≡ brute-force foreign-position removal; canonical copies intact") {
    val c = corpus
    val kd = keyDocs(c)
    val expected = c.toSeq.sortBy(_._1).map { case (id, l) =>
      val covered = (0 to l.length - W).flatMap { i =>
        val docs = kd(l.slice(i, i + W).mkString(" "))
        if (docs.size >= 2 && id > docs.min) i until i + W else Seq.empty
      }.toSet
      val keptToks = l.indices.filterNot(covered).map(l)
      (id, keptToks.mkString(" "), (l.length - keptToks.length).toLong)
    }
    val got = TierFourteen.q102.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0), "some doc must lose foreign spans")
    // keep-first semantics: for every shared key, its owner doc keeps the text
    val sharedOwners = kd.filter(_._2.size >= 2).values.map(_.min).toSet
    val byId = got.map(t => t._1 -> t._2).toMap
    val someOwner = sharedOwners.head
    // the owner's canonical copy may still lose OTHER spans it doesn't own;
    // but a doc that owns EVERY shared key it touches is untouched
    val untouchedOwners = c.keys.filter { id =>
      val l = c(id)
      (0 to l.length - W).forall { i =>
        val docs = kd(l.slice(i, i + W).mkString(" "))
        docs.size < 2 || docs.min == id
      }
    }
    assert(untouchedOwners.nonEmpty && someOwner >= 0)
    untouchedOwners.foreach(id => assert(byId(id) == c(id).mkString(" ")))
  }

  test("q103 overlap ≡ brute-force winnowed trigram-hash pair join (real corpus)") {
    val c = corpus
    // the deterministic vocab: 1-based rank of the sorted distinct tokens
    val tid = c.values.flatten.toSeq.distinct.sorted.zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    val P = 2147483647L
    val winnowed: Map[Long, Set[Long]] = c.map { case (id, l) =>
      id -> l.sliding(3).filter(_.length == 3)
        .map(w => (tid(w(0)) * 131 * 131 + tid(w(1)) * 131 + tid(w(2))) % P)
        .filter(_ % 16 == 0).toSet
    }
    val ids = winnowed.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      shared = (winnowed(i) & winnowed(j)).size if shared >= 2
    } yield (i, j, shared.toLong,
      shared.toLong * 1000000L / math.min(winnowed(i).size, winnowed(j).size)))
      .sortBy(t => (t._1, t._2))
    val got = TierFourteen.q103.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "corpus must contain overlapping fingerprints")
  }

  test("q104 priority survivors ≡ union-find + argmax(n_tokens, doc_id); same clusters as keep-min") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
    val distinct = Dedup.exactSurvivors(docs)
    val ids = distinct.select("doc_id").collect().map(_.getLong(0)).toSeq
    val pairs = Dedup.nearDupPairs(distinct).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nTok = distinct.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong).toMap
    val expected = ids.groupBy(find).map { case (lbl, members) =>
      val surv = members.maxBy(m => (nTok(m), m))
      (lbl, surv, nTok(surv))
    }.toSeq.sortBy(_._1)
    val got = TierFourteen.q104.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the POLICY changes which doc survives, never how many clusters exist
    assert(got.map(_._1).toSet == ids.groupBy(find).keySet)
    assert(got.exists { case (lbl, surv, _) => lbl != surv },
      "some cluster must pick a non-min survivor or the policy is untested")
  }

  test("q105 gate ≡ brute-force exact order statistic; admits ~10% plus threshold ties") {
    import graft.operators.TierEleven
    val scores = TierEleven.classifierScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = scores.size
    val k = math.ceil(0.9 * n).toInt
    val thr = scores.toSeq.map { case (id, sc) => (sc, id) }.sorted.apply(k - 1)._1
    val admitted = scores.values.count(_ >= thr)
    val got = TierFourteen.q105.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).distinct.toSeq == Seq(thr), "threshold must be the exact rank-k score")
    assert(got.map(_._2).sum == n && got.map(_._3).sum == admitted)
    // the gate admits the top decile up to ties at the threshold value
    val ties = scores.values.count(_ == thr)
    assert(admitted >= n - k + 1 && admitted <= n - k + ties)
    assert(admitted < n / 2, "gate must actually gate")
  }

  test("tier-14 plans: no CartesianProduct, no single-partition exchange") {
    for (q <- Seq(TierFourteen.q101, TierFourteen.q102,
        TierFourteen.q103, TierFourteen.q104, TierFourteen.q105)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(500)}")
      assert(!plan.contains("Exchange SinglePartition"), s"${q.name}: ${plan.take(500)}")
    }
  }
}
