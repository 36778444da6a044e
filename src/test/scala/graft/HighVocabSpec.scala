package graft

import graft.operators.{TierFour, TierThree}

/** The >64-token-vocabulary branches of the near-dup family — dead code on
  * the production corpus (31-token dictionary) and therefore never hit by
  * the oracle runs: q23's token-self-join path and q26's
  * tokenArrays/array_intersect verification path. A 100-token synthetic
  * corpus forces both, checked differentially against a pure-Scala exact
  * computation.
  */
class HighVocabSpec extends SparkSpec {
  import spark.implicits._

  // deterministic token sets: doc 2i and 2i+1 differ in one token of 20
  // (J = 19/21 ≈ 0.905 — planted near-dups); cross-cluster overlap is low
  private lazy val sets: Map[Long, Set[Int]] = (0 until 30).flatMap { i =>
    val base = (0 until 20).map(k => (i * 7 + k * 3) % 100).toSet
    Seq(
      (2L * i) -> base,
      (2L * i + 1) -> (base - base.head + ((i * 7 + 61) % 100)))
  }.toMap

  private lazy val tmp: String = {
    val dir = java.nio.file.Files.createTempDirectory("highvocab").toString
    sets.toSeq.sortBy(_._1)
      .map { case (id, ts) =>
        val text = ts.toSeq.sorted.map(t => f"tok$t%03d").mkString(" ")
        (id, text, "en", "s", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val exact: Map[(Long, Long), Double] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      a <- ids; b <- ids if a < b
      i = sets(a).intersect(sets(b)).size
      j = i.toDouble / (sets(a).size + sets(b).size - i)
      if j >= 0.6
    } yield (a, b) -> j).toMap
  }

  test("vocabHint pins the dispatch without changing results (both forced paths ≡ adaptive)") {
    // production corpus (31-token dictionary): adaptive picks the bitmask
    // path; `large` forces the generic path; `small` promises what is
    // already true. All three must produce identical pairs — and the
    // pinned runs skip the plan-time vocabulary count entirely.
    def pairs() = TierThree.q23.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val adaptive = pairs()
    assert(adaptive.nonEmpty)
    for (hint <- Seq("small", "large")) {
      spark.conf.set("spark.graft.vocabHint", hint)
      try assert(pairs() == adaptive, s"hint=$hint diverged")
      finally spark.conf.unset("spark.graft.vocabHint")
    }
  }

  test("a WRONG vocabHint=small promise fails fast instead of silently corrupting") {
    // tid 65 would set the same mask bit as tid 1 (shift wraps mod 64) —
    // the tokenMasks guard must raise, not emit wrong intersections
    spark.conf.set("spark.graft.vocabHint", "small")
    try {
      val e = intercept[Exception](TierThree.q23.run(spark, tmp).collect())
      assert(e.getMessage != null && e.getMessage.contains("bitmask path invalid"),
        s"expected the tokenMasks guard, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.vocabHint")
  }

  test("q23 generic token-join path (vocab > 64) matches pure-Scala exact pairs") {
    val rows = TierThree.q23.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty && exact.size >= 30, s"corpus must plant pairs, got ${exact.size}")
    assert(rows.keySet == exact.keySet,
      s"missing=${(exact.keySet -- rows.keySet).take(5)} extra=${(rows.keySet -- exact.keySet).take(5)}")
    rows.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-6, s"$k: $j vs ${exact(k)}") }
  }

  test("q26 array-verification path (vocab > 64): subset of exact, high-J recall ~1") {
    val lsh = TierFour.q26.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.keySet.subsetOf(exact.keySet),
      s"false positives survived verification: ${(lsh.keySet -- exact.keySet).take(5)}")
    // 8×4 banding has its S-curve threshold at (1/8)^(1/4) ≈ 0.595 — pairs
    // AT J≈0.6 are ~50% by construction, so overall recall is the wrong
    // yardstick on a corpus dense in marginal pairs. The sketch's contract
    // is the high-similarity region: the planted J = 19/21 ≈ 0.905 twins
    // have miss probability (1 − 0.905⁴)⁸ ≈ 4·10⁻⁴ — demand ALL of them.
    val planted = (0 until 30).map(i => (2L * i, 2L * i + 1))
      .filter(exact.contains) // all 30, by construction
    assert(planted.size == 30)
    val missed = planted.filterNot(lsh.contains)
    assert(missed.isEmpty, s"planted near-dups missed by LSH: $missed")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.4, s"overall recall collapsed: $recall (${lsh.size}/${exact.size})")
    lsh.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-6) }
  }
}
