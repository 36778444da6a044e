package graft

import graft.operators.TierNine
import org.apache.spark.sql.functions._

/** Tier-9 operator properties beyond the DuckDB oracle (which pins exact
  * values at sf0.01): structural invariants of chunking, the quota cap, the
  * HLL registers vs a brute-force reference, the q66 plan shape, and the
  * k-means objective actually improving across the Lloyd step.
  */
class TierNineSpec extends SparkSpec {

  test("q63 chunks reconstruct the tokenized document exactly (coverage + overlap)") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), filter(split(col("text"), " "), t => t =!= "").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = TierNine.q63.run(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(chunks.keySet == docs.keySet)
    for ((id, rows) <- chunks) {
      val toks = docs(id)
      rows.foreach { r =>
        val start = r.getLong(1).toInt * 24
        val expect = toks.slice(start, start + 32)
        assert(r.getString(3) == expect.mkString(" "), s"doc $id chunk ${r.getLong(1)}")
        assert(r.getLong(2) == expect.length)
      }
      // chunk starts step by the stride until tokens run out → full coverage
      assert(rows.length == (toks.length + 23) / 24)
    }
  }

  test("q63 plan is shuffle-free (narrow per-row transform)") {
    val plan = TierNine.q63.run(spark, sf).queryExecution.executedPlan.toString
    // the single Exchange allowed is the rangepartitioning for the oracle
    // ORDER BY; no hashpartitioning (aggregation/join) exchange may appear
    assert(!plan.contains("hashpartitioning"), plan.take(800))
  }

  test("q64 respects the per-source cap and is stable under repartition") {
    val out = TierNine.q64.run(spark, sf)
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 10))
    // deterministic: same survivors regardless of input partitioning
    val again = TierNine.q64.run(spark, sf).collect().map(_.toString).sorted
    val first = out.collect().map(_.toString).sorted
    assert(first.sameElements(again))
  }

  test("q65 registers and estimate match a brute-force HLL on the same hash") {
    val P = 2147483647L; val A0 = 2654435761L; val B0 = 40503L
    val users = Tables.load(spark, sf, "events")
      .select("user_id").collect().map(_.getLong(0))
    val regs = Array.fill(64)(0L)
    users.foreach { u =>
      val h0 = ((u % P) * A0 + B0) % P
      val h = (h0 * h0) % P
      val b = (h % 64).toInt; val w = h / 64
      val rho = 26 - (if (w == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    val rMax = regs.max
    val sScaled = regs.map(r => 1L << (rMax - r)).sum
    val row = TierNine.q65.run(spark, sf).collect().head
    assert(row.getLong(1) == rMax, s"r_max ${row.getLong(1)} vs $rMax")
    assert(row.getLong(2) == sScaled, s"s_scaled ${row.getLong(2)} vs $sScaled")
    val nTrue = users.distinct.length
    assert(row.getLong(3) == nTrue)
    // below the linear-counting range (n < 2.5m) the RAW estimator
    // overestimates by design (documented q65 semantics) — only its sign
    // is stable there; the accuracy gate runs at sf0.1 below
    assert(row.getDouble(4) >= nTrue, s"est ${row.getDouble(4)} vs true $nTrue")
  }

  test("q65 estimate lands within raw-HLL error once n exceeds the linear-counting range") {
    // sf0.1: 1500 distinct users ≫ 2.5·64 — raw HLL typical error at m=64
    // is 1.04/√64 ≈ 13%; generous 3σ-ish gate
    val row = TierNine.q65.run(spark, "/root/testdata/sf0.1").collect().head
    val nTrue = row.getLong(3)
    assert(nTrue > 160)
    assert(math.abs(row.getDouble(4) - nTrue) / nTrue < 0.4,
      s"est ${row.getDouble(4)} vs true $nTrue")
  }

  test("q66 pushes the PROMO filter into the part scan and broadcasts nation") {
    val plan = TierNine.q66.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("p_type"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q67 Lloyd step does not increase the k-means objective") {
    graft.expressions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def inertia(cents: Seq[Array[Double]]): Double =
      emb.values.map(e => cents.map(c => d2(e, c)).min).sum
    val seeds = (0L to 3L).map(emb)
    // recompute the round-1 centroids the way q67 does (means of the seed
    // assignment, 6-dp rounded) and check the objective moved down
    val assign0 = emb.toSeq.map { case (_, e) =>
      (seeds.zipWithIndex.minBy { case (c, i) => (d2(e, c), i) }._2, e)
    }
    val cent1 = assign0.groupBy(_._1).values.map { grp =>
      val n = grp.size
      val sum = grp.map(_._2).transpose.map(_.sum / n)
      sum.map(v => math.rint(v * 1e6) / 1e6).toArray
    }.toSeq
    assert(inertia(cent1) <= inertia(seeds) * 1.0000001,
      s"${inertia(cent1)} vs ${inertia(seeds)}")
    // and the declared query's sizes account for every vector
    val sizes = TierNine.q67.run(spark, sf).collect().map(_.getLong(1)).sum
    assert(sizes == emb.size)
  }

  test("q68 packs every token exactly once into full bins (tail excepted), no single-partition stage") {
    val df = TierNine.q68.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(800))
    val rows = df.collect()
    val totalTokens = Tables.load(spark, sf, "documents")
      .select(size(filter(split(col("text"), " "), t => t =!= "")).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalTokens, "every token lands in exactly one bin")
    // bins are dense 0..N-1; all full except possibly the last
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq)
    assert(rows.init.forall(_.getLong(1) == 64))
    assert(rows.last.getLong(1) <= 64)
    // doc spans are monotone: the next bin starts at (or after) the doc
    // the previous bin ended in — the concat order never goes backwards
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) >= a.getLong(4), s"bins ${a.getLong(0)}/${b.getLong(0)}")
    }
  }

  test("q71 achieved mix tracks the target rates and is retry-stable") {
    val rows = TierNine.q71.run(spark, "/root/testdata/sf0.01").collect()
    rows.foreach { r =>
      val (target, total, kept, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(kept <= total)
      assert(ppm == kept * 1000000 / total)
      // binomial noise at the fixture group sizes stays well inside ±0.25
      assert(math.abs(ppm - target) <= 250000,
        s"lang ${r.getString(0)}: achieved $ppm vs target $target")
    }
    val again = TierNine.q71.run(spark, "/root/testdata/sf0.01").collect().toSeq
    assert(rows.toSeq == again, "hash-based mixing must be deterministic")
  }

  test("q72 histogram quantiles land in the exact rank's bucket (error ≤ width)") {
    val sf01 = "/root/testdata/sf0.01"
    val byType = Tables.load(spark, sf01, "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    TierNine.q72.run(spark, sf01).collect().foreach { r =>
      val vals = byType(r.getString(0)); val n = vals.length
      def exact(qn: Int): Double = vals((qn * n + 9) / 10 - 1) // nearest-rank value
      assert(math.abs(r.getDouble(1) - exact(5)) <= 5.0,
        s"${r.getString(0)} p50 ${r.getDouble(1)} vs exact ${exact(5)}")
      assert(math.abs(r.getDouble(2) - exact(9)) <= 5.0,
        s"${r.getString(0)} p90 ${r.getDouble(2)} vs exact ${exact(9)}")
      assert(r.getDouble(1) <= r.getDouble(2), "p50 ≤ p90")
    }
  }

  test("q69 clusters partition the vector set (histogram mass = corpus size)") {
    val rows = TierNine.q69.run(spark, sf).collect()
    val nVecs = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == nVecs,
      "Σ csize·n_clusters must cover every vector exactly once")
    assert(rows.exists(_.getLong(0) > 1), "fixture must contain at least one real cluster")
  }
}
