package graft

import graft.operators.TierSixtySix
import org.apache.spark.sql.functions._

/** Tier-66 differentials: q215 against an in-memory arm recount with the
  * alarm branch fired on a CONSTRUCTED imbalanced assignment (the
  * fixture's hash splits 73/77 — an honest pass), and q216's metric fold
  * pinned by unit laws plus the ranker-separation law on the fixture.
  */
class TierSixtySixSpec extends SparkSpec {

  import spark.implicits._

  private val (a0, b0, p) = (2654435761L, 40503L, 2147483647L)
  private def armOf(u: Long): Long = ((u % p) * a0 + b0) % p % 2

  test("q215 ≡ in-memory recount; honest pass on the fixture") {
    val got = TierSixtySix.q215.run(spark, sf).collect()(0)
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val na = users.count(armOf(_) == 0L).toLong
    val nb = users.count(armOf(_) == 1L).toLong
    val chi2 = BigInt(1000000) * (na - nb) * (na - nb) / (na + nb)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      (na + nb, na, nb, chi2.toLong))
    assert(got.getLong(4) == 0L, "the fixture's hash split must pass SRM")
  }

  test("q215 alarm fires on a constructed imbalanced assignment") {
    // pick user ids BY their arm so the 'assignment bug' is 10:1
    val ids = (1L to 20000L)
    val skewed = (ids.filter(armOf(_) == 0L).take(1000) ++
      ids.filter(armOf(_) == 1L).take(100)).map(Tuple1(_))
      .toDF("user_id")
    val r = TierSixtySix.srmReport(spark, skewed).collect()(0)
    assert(r.getLong(1) == 1000L && r.getLong(2) == 100L)
    // chi2 = 900^2/1100 ≈ 736 ≫ 3.84
    assert(r.getLong(4) == 1L, "a 10:1 split must fire the SRM alarm")
  }

  test("q216 metric fold unit laws and ranker separation") {
    val rel = Set(1L, 2L, 3L, 4L, 5L)
    // perfect ranking: all metrics saturate (recall caps at k/|rel| when k ≥ |rel|)
    assert(TierSixtySix.irMetrics(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L),
      rel, 10) == (500000L, 1000000L, 1000000L))
    // no hits anywhere: zeros, MRR's no-hit branch
    assert(TierSixtySix.irMetrics((100L to 109L).toSeq, rel, 10) == (0L, 0L, 0L))
    // first hit at position 4: MRR = 10^6 / 4
    assert(TierSixtySix.irMetrics(Seq(90L, 91L, 92L, 1L, 93L, 94L, 95L, 96L,
      97L, 98L), rel, 10) == (100000L, 200000L, 250000L))

    val rows = TierSixtySix.q216.run(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows(("bm25", "p_at_10")) > rows(("len_desc", "p_at_10")),
      "the harness must separate the BM25 ranker from the query-blind baseline")
    assert(rows(("bm25", "mrr_at_10")) == 1000000L,
      "BM25's top hit on the rare-term query must be relevant")
  }
}
