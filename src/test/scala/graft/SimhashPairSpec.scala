package graft

import graft.operators.TierSeven
import org.apache.spark.sql.functions._

/** The banded Hamming pair join against brute force on random signatures —
  * the pigeonhole claim (distance ≤ 3 ⇒ some 16-bit chunk equal ⇒ EXACT
  * recall) checked on signature distributions the corpus oracle can't
  * produce: planted near-misses at exactly distance 3 and 4, sparse and
  * dense bit patterns, zero and all-bits signatures.
  */
class SimhashPairSpec extends SparkSpec {
  import spark.implicits._

  private def brute(sigs: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= 3
    } yield (ia, ib, h)).toSet

  private def run(sigs: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    TierSeven.hammingPairs(sigs.toDF("doc_id", "simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("planted distances: 0,1,3 are found, 4 is excluded") {
    val base = 0x1234_5678_9ABC_DEFL & 0x7FFFFFFFFFFFFFFFL
    val sigs = Seq(
      1L -> base,
      2L -> base,                                  // distance 0
      3L -> (base ^ 1L),                           // distance 1 (chunk 0)
      4L -> (base ^ (1L | (1L << 20) | (1L << 40))), // distance 3, spread chunks
      5L -> (base ^ (15L << 10)),                  // distance 4 — excluded
      6L -> 0L,                                    // far away
      7L -> 0x7FFFFFFFFFFFFFFFL)                   // all 63 bits
    assert(run(sigs) == brute(sigs))
    assert(run(sigs).exists { case (a, b, h) => a == 1L && b == 4L && h == 3L })
    assert(!run(sigs).exists { case (a, b, _) => a == 1L && b == 5L })
  }

  test("random signatures: banded join ≡ brute force (exact recall, no extras)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    for (seed <- 0 until 3) {
      // mix of fully random signatures and near-duplicates of a few bases
      val bases = (0 until 5).map(i =>
        Gen.chooseNum(0L, Long.MaxValue).apply(Gen.Parameters.default, Seed(seed * 77L + i))
          .get & 0x7FFFFFFFFFFFFFFFL)
      val sigs = (0 until 60).map { i =>
        val g = Gen.chooseNum(0L, Long.MaxValue)
          .apply(Gen.Parameters.default, Seed(seed * 1000L + i)).get
        val s =
          if (i % 3 == 0) bases(i % 5) ^ (1L << (i % 63)) // near-dup of a base
          else g & 0x7FFFFFFFFFFFFFFFL
        i.toLong -> s
      }
      assert(run(sigs) == brute(sigs), s"seed $seed diverged")
    }
  }

  test("hammingAdmit ≡ incoming minus hammingScreen's matched docs (anti-join form)") {
    val base = 0x0F0F_0F0F_0F0F_0F0L
    val corpus = ((0 until 30).map(i => (100L + i, (i.toLong * 0x9E3779B97F4AL) & Long.MaxValue))
      ++ Seq((200L, base))).toDF("doc_id", "simhash")
    val incoming = Seq(
      (900L, base ^ 5L),                  // d=2 → screened out
      (901L, base ^ (15L << 50)),         // d=4 from base → admitted
      (902L, 0x123456789ABCDEFL)).toDF("doc_id", "simhash")
    val admitted = TierSeven.hammingAdmit(incoming, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val matched = TierSeven.hammingScreen(incoming, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = incoming.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == all -- matched)
    assert(admitted.contains(901L) && !admitted.contains(900L))
    // every anti-join must be a genuine EQUI-join on the chunk key — an
    // earlier form indexed the incoming chunks by the corpus side's j and
    // planned the all-pairs BroadcastNestedLoopJoin this operator exists
    // to avoid
    val plan = TierSeven.hammingAdmit(incoming, corpus)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }

  test("simhashCol: per-row ingest signature is order/repetition invariant, 0 on empty") {
    import graft.operators.TextOps
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"),          // permutation of 1
      (3L, "alpha beta gamma delta epsilon zeta alpha beta gamma delta epsilon zeta"), // 1 doubled
      (4L, "totally different words entirely here now"),
      (5L, ""), (6L, "   "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.simhashCol(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == rows(2L), "token order must not change the signature")
    assert(rows(1L) == rows(3L), "doubling every margin must not change signs")
    assert(rows(4L) != rows(1L))
    assert(rows(5L) == 0L && rows(6L) == 0L)
    assert(rows(1L) >= 0L, "63-bit signature stays nonnegative")
  }

  test("native SimHash expression ≡ declarative reference bit-for-bit, inside codegen, null-safe") {
    import graft.operators.TextOps
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val both = docs.select(col("doc_id"),
      TextOps.simhashCol(col("text")).as("fast"),
      TextOps.simhashColReference(col("text")).as("slow"))
    both.collect().foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)} diverged"))
    // the expression fuses into whole-stage codegen (the reference form
    // can't — higher-order functions are CodegenFallback)
    val plan = docs.select(TextOps.simhashCol(col("text")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_simhash"), plan.take(500))
    // null in, null out; interpreted eval path agrees (constant folding
    // evaluates literals without codegen)
    graft.expressions.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_simhash(CAST(null AS STRING)) AS n,
        |       graft_simhash('alpha beta') AS v""".stripMargin).head()
    assert(row.isNullAt(0))
    assert(row.getLong(1) >= 0L)
  }
}
