package graft

import graft.operators.{Graph, Release, TierNineteen, TierThirty, TierTwentySix}
import org.apache.spark.sql.functions._

/** Tier-30 differentials: q144 against in-memory Dijkstra over the
  * ppm-cost near-dup edges (plus the q136 reachability cross-law), q145
  * against a brute-force mutual-NN scan (plus pairing laws); plan gates.
  */
class TierThirtySpec extends SparkSpec {

  private def docsAndPairs = {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val pairs = TierNineteen.embedPairsOf(
        Tables.load(spark, sf, "documents").select("doc_id", "text"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    operators.Cumulative.releaseAll()
    (docs, pairs)
  }

  test("q144 drift distance ≡ in-memory Dijkstra; seeds at 0; reach ≡ q136's hop reach") {
    val (docs, pairs) = docsAndPairs
    val cost = pairs.flatMap { case (a, b, c) =>
      val w = 1000000L - math.floor(c * 1000000.0).toLong
      Seq((a, b, w), (b, a, w))
    }
    val adj = cost.groupBy(_._1).map { case (n, es) => n -> es.map(e => (e._2, e._3)) }
    val seeds = docs.filter(_._3 == "src0").map(_._1).toSet
    // plain Dijkstra — nonneg costs, so it computes the same fixpoint the
    // engine's Bellman-Ford relaxation converges to
    val dist = scala.collection.mutable.Map(seeds.toSeq.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      seeds.toSeq.map(s => (-0L, s)): _*)(Ordering.by(_._1))
    while (pq.nonEmpty) {
      val (nd, n) = pq.dequeue()
      if (-nd == dist(n))
        adj.getOrElse(n, Seq.empty).foreach { case (m, w) =>
          if (dist.get(m).forall(_ > dist(n) + w)) {
            dist(m) = dist(n) + w
            pq.enqueue((-dist(m), m))
          }
        }
    }
    val expected = docs.map(_._1).sorted.map(id => (id, dist.getOrElse(id, -1L)))
    val got = TierThirty.q144.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    operators.Cumulative.releaseAll()
    assert(got == expected)
    seeds.foreach(s => assert(got.find(_._1 == s).exists(_._2 == 0L), s"seed $s at 0"))
    assert(got.exists(_._2 > 0) && got.exists(_._2 == -1L),
      "fixture must reach beyond the seeds and leave a periphery")
    // cost-reachability ≡ hop-reachability UNBOUNDED — but q136 caps at 4
    // hops, so its reached set is a SUBSET of q144's (same graph, same
    // seeds; anything q136 reaches in ≤4 hops has a finite cost path)
    val hops = TierTwentySix.q136.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    operators.Cumulative.releaseAll()
    val reached144 = got.filter(_._2 >= 0).map(_._1).toSet
    val reached136 = hops.filter(_._2 >= 0).keySet
    assert(reached136.subsetOf(reached144),
      s"hop-reached must be cost-reached; missing: ${reached136 -- reached144}")
    // the engine reaches the fixpoint inside the shared round cap
    val ed = spark.createDataFrame(cost).toDF("src", "dst", "w")
    val sp = Graph.ssspReleasable(ed,
      spark.createDataFrame(seeds.toSeq.map(Tuple1(_))).toDF("nid"), maxRounds = 10)
    assert(sp.rounds < 10, s"relaxation must converge inside the cap, ran ${sp.rounds}")
    sp.release()
  }

  test("q145 mutual NN ≡ brute force; each doc in ≤ 1 pair; the closest pair is mutual") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val all = TierNineteen.embedPairsOf(docs, -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    operators.Cumulative.releaseAll()
    val sym = all.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
    val nn = sym.groupBy(_._1).map { case (d, es) =>
      d -> es.maxBy(e => (e._3, -e._2))._2 // best c, ties to the smaller id
    }
    val cos = sym.map(e => (e._1, e._2) -> e._3).toMap
    val expected = nn.toSeq
      .filter { case (d, m) => nn.get(m).contains(d) && d < m }
      .map { case (d, m) =>
        (d, m, BigDecimal(cos((d, m))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy(_._1)
    val got = TierThirty.q145.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    operators.Cumulative.releaseAll()
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain mutual pairs")
    val members = got.flatMap(p => Seq(p._1, p._2))
    assert(members.distinct.size == members.size, "a doc belongs to at most one mutual pair")
    // law: the globally closest pair is always mutual — its endpoints have
    // no better neighbor, and the shared (c desc, id asc) tie-break keeps
    // them pointing at each other even when the max cosine is tied
    val globalMax = BigDecimal(all.map(_._3).max)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.exists(_._3 == globalMax),
      s"the global max-cosine pair ($globalMax) must be mutual")
  }

  test("tier-30 plan gates: no CartesianProduct; q145 arg-max is agg, not Window") {
    for (q <- TierThirty.all) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      operators.Cumulative.releaseAll()
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(800)}")
      if (q.name.contains("mutual"))
        assert(!plan.contains("Window"), s"${q.name} must arg-max via struct agg: ${plan.take(800)}")
    }
    Release.sweep(spark)
  }
}
