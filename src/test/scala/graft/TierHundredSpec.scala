package graft

import graft.operators.TierHundred
import org.apache.spark.sql.functions._

/** Tier-100 differentials: q279 against an in-driver profile replay
  * (plus the self-similarity and disjoint-vocab laws), q280 against the
  * purity laws on constructed labelings.
  */
class TierHundredSpec extends SparkSpec {
  import spark.implicits._

  test("q279 ≡ in-driver profile cosine replay; matrix is complete and bounded") {
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val prof = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }
    val srcs = prof.keys.toSeq.sorted
    val expected = (for {
      (a, i) <- srcs.zipWithIndex; b <- srcs.drop(i + 1)
    } yield {
      val (pa, pb) = (prof(a), prof(b))
      val dot = pa.keysIterator.filter(pb.contains).map(t => pa(t) * pb(t)).sum
      val qa = pa.values.map(v => v * v).sum
      val qb = pb.values.map(v => v * v).sum
      val cos = BigDecimal(dot.toDouble / (math.sqrt(qa.toDouble) * math.sqrt(qb.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, dot, cos)
    }).sortBy(x => (x._1, x._2))
    val got = TierHundred.q279.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected,
      s"matrix mismatch: ${got.take(2)} vs ${expected.take(2)}")
    assert(got.size == srcs.size * (srcs.size - 1) / 2, "complete upper triangle")
    assert(got.forall(x => x._4 >= 0.0 && x._4 <= 1.0),
      "cosines of count profiles live in [0, 1]")
    // same-register sources on one generator: profiles must correlate
    assert(got.map(_._4).max > 0.5, "fixture sources must visibly overlap")
  }

  test("profileCosineOver laws: identical profiles ⇒ 1; disjoint vocab ⇒ no pair row") {
    val tc = Seq(
      ("a", "x", 3L), ("a", "y", 4L),
      ("b", "x", 3L), ("b", "y", 4L),   // b ≡ a
      ("c", "z", 9L))                   // c disjoint from both
      .toDF("src", "token", "cnt")
    val got = TierHundred.profileCosineOver(tc).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("a", "b")) == 1.0, "identical profiles must score exactly 1")
    // a zero dot product never materializes a row in the token-keyed join
    // (the sparse contract: absence == 0 — the reader coalesces)
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
  }

  test("q280 purity laws: intra-source clusters ⇒ 10⁶; even split ⇒ 500000; singletons excluded") {
    val prov = Seq((1L, "s1"), (2L, "s1"), (3L, "s2"), (4L, "s2"),
      (5L, "s1"), (6L, "s2"), (7L, "s1")).toDF("id", "src")
    // two pure 2-clusters and one singleton
    val pure = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("id", "lbl")
    val gotPure = TierHundred.purityOver(pure, prov).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotPure.toSeq == Seq((2L, 2L, 1000000L)),
      s"pure clusters must read 10⁶ and singletons vanish, got ${gotPure.toSeq}")
    // one 4-cluster split 2/2 across sources → 500000 ppm
    val mixed = Seq((1L, 1L), (2L, 1L), (3L, 1L), (6L, 1L))
      .toDF("id", "lbl")
    val gotMixed = TierHundred.purityOver(mixed, prov).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotMixed.toSeq == Seq((4L, 1L, 500000L)))
    // the declared query agrees with a direct label join on the fixture
    val q = TierHundred.q280.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(q.nonEmpty && q.forall(x => x._3 >= 1000000L / x._1 && x._3 <= 1000000L),
      s"majority share lives in [1/csize, 1]: ${q.toSeq}")
    spark.catalog.clearCache()
  }
}
