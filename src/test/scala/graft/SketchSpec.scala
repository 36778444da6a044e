package graft

import graft.functions.Sketches
import graft.operators.TierTwo
import org.apache.spark.sql.functions._

/** Sketch aggregates: tolerance-checked against exact answers
  * (nondeterministic across engines, so excluded from the DuckDB oracle —
  * SURVEY.md §2.3). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact per-group distinct (q17's sketch twin)") {
    val events = Tables.load(spark, sf, "events")
    val exact = TierTwo.q17.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxUsersByType(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n < 0.15, s"$k: approx $a vs exact $n")
    }
  }

  test("CountMin: build once / probe many; est ≥ true always, exact at generous width") {
    import graft.functions.CountMin
    import spark.implicits._
    val counts = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("id", "n")
    // tight sketch (4×16 cells for 200 keys): collisions certain, but the
    // CMS guarantee est ≥ true must hold for every key
    val tight = CountMin.build(counts, col("id"), col("n"), depth = 4, width = 16)
    assert(tight.count() <= 4 * 16)
    val probedTight = CountMin.probe(counts, col("id"), tight, depth = 4, width = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(probedTight.length == 200)
    probedTight.foreach { case (id, n, est) => assert(est >= n, s"id $id: est $est < true $n") }
    assert(probedTight.exists { case (_, n, est) => est > n }, "16-wide sketch must collide")
    // generous sketch: same build, probed TWICE (the reuse shape) — and at
    // width 4096 these 200 keys happen not to collide, so est == true
    val wide = CountMin.build(counts, col("id"), col("n"), depth = 4, width = 4096)
    for (_ <- 1 to 2) {
      val probed = CountMin.probe(counts, col("id"), wide, depth = 4, width = 4096)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      probed.foreach { case (id, n, est) => assert(est == n, s"id $id: est $est != true $n") }
    }
    // a key never built: probe answers (0 when it hits any empty cell;
    // never negative, never above the total mass)
    val total = counts.agg(sum("n")).head().getLong(0)
    val unseen = CountMin.probe(Seq((987654321L, 0L)).toDF("id", "n"), col("id"), tight,
        depth = 4, width = 16).head().getLong(2)
    assert(unseen >= 0 && unseen <= total)
  }

  test("Bloom: no false negatives ever; false positives exist at tight sizing; reuse") {
    import graft.functions.Bloom
    import spark.implicits._
    val members = (0L until 100L).map(i => i * 7 + 3).toDF("id")
    val f = Bloom.build(members, col("id"), bits = 256, hashes = 3).persist()
    assert(f.count() <= 256)
    // every built key must test positive — the one-sided guarantee
    val memberProbe = Bloom.mightContain(members, col("id"), f, bits = 256, hashes = 3)
    assert(memberProbe.filter(!col("maybe")).count() == 0, "false negative!")
    // non-members: mostly negative, some false positives at 100 keys/256 bits
    val others = (2000L until 3000L).toDF("id")
    val otherProbe = Bloom.mightContain(others, col("id"), f, bits = 256, hashes = 3)
      .persist()
    val fp = otherProbe.filter(col("maybe")).count()
    assert(fp < 1000, "filter must reject most non-members")
    assert(otherProbe.filter(!col("maybe")).count() > 500)
    // probe the same filter again (build-once / probe-many): identical
    val again = Bloom.mightContain(others, col("id"), f, bits = 256, hashes = 3)
      .filter(col("maybe")).count()
    assert(again == fp)
    // the packed-literal Column form (the streaming-stateless variant)
    // answers identically to the join form on every probe
    val words = Bloom.toBits(f, bits = 256)
    val colForm = (0L until 3000L).toDF("id")
      .withColumn("maybe", Bloom.mightContainCol(words, col("id"), bits = 256, hashes = 3))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val joinForm = Bloom.mightContain((0L until 3000L).toDF("id"), col("id"), f,
        bits = 256, hashes = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(colForm == joinForm)
    f.unpersist(); otherProbe.unpersist()
  }

  test("Bloom and CountMin accept NEGATIVE ids (pmod hash, no negative positions)") {
    import graft.functions.{Bloom, CountMin}
    import spark.implicits._
    // e.g. xxhash64-derived keys: ~half negative — signed % would produce
    // negative positions/cells (toBits crash, packed-probe error)
    val ids = Seq(-1L, -2147483648L, Long.MinValue, -987654321L, 5L, 0L)
    val keys = ids.toDF("id")
    val f = Bloom.build(keys, col("id"), bits = 256, hashes = 3)
    assert(f.collect().map(_.getLong(0)).forall(p => p >= 0 && p < 256))
    val probed = Bloom.mightContain(keys, col("id"), f, bits = 256, hashes = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    ids.foreach(i => assert(probed(i), s"false negative for $i"))
    val counts = ids.zipWithIndex.map { case (i, n) => (i, n + 1L) }.toDF("id", "n")
    val cms = CountMin.build(counts, col("id"), col("n"), depth = 4, width = 64)
    assert(cms.collect().forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    val est = CountMin.probe(counts, col("id"), cms, depth = 4, width = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    est.foreach { case (i, n, e) => assert(e >= n, s"CMS under-estimate for $i") }
  }

  test("merge laws: CMS merge ≡ build over the multiset union; Bloom union ≡ build over the set union") {
    // the distributable-sketch algebra: build per partition/day/source,
    // merge the broadcast-sized sketch tables, never re-scan the data
    import graft.functions.{Bloom, CountMin}
    import spark.implicits._
    val aRows = (1L to 120L).map(i => (i, i % 5 + 1))
    val bRows = (80L to 220L).map(i => (i, i % 3 + 2)) // overlapping keys
    val a = aRows.toDF("id", "n"); val b = bRows.toDF("id", "n")
    // CMS: cells are sums — merge must equal the one-shot build over the
    // per-key SUMMED frequencies (a key in both inputs adds its counts)
    val both = (aRows ++ bRows).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq.map { case (k, v) => (k, v) }
      .toDF("id", "n")
    val merged = CountMin.merge(
      CountMin.build(a, col("id"), col("n")), CountMin.build(b, col("id"), col("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = CountMin.build(both, col("id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot && merged.nonEmpty)
    // Bloom: bit set — union must equal the build over the key union,
    // in both the row and the packed-word form
    val fa = Bloom.build(a, col("id")); val fb = Bloom.build(b, col("id"))
    val fu = Bloom.union(fa, fb).collect().map(_.getLong(0)).toSet
    val fAll = Bloom.build(a.select("id").unionAll(b.select("id")), col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(fu == fAll && fu.nonEmpty)
    assert(Bloom.unionBits(Bloom.toBits(fa), Bloom.toBits(fb)).toSeq ==
      Bloom.toBits(Bloom.union(fa, fb)).toSeq)
  }

  test("approxQuantile brackets the exact median") {
    val events = Tables.load(spark, sf, "events")
    val Array(q50) = Sketches.approxQuantiles(events, "value", Array(0.5))
    val exact = events.select(expr("percentile(value, 0.5)")).head().getDouble(0)
    assert(math.abs(q50 - exact) / math.max(math.abs(exact), 1e-9) < 0.25,
      s"approx $q50 vs exact $exact")
  }
}
