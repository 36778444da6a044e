package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 85 (round 13): chained-window funnels + the dedup-threshold
  * cost curve.
  *
  *  - q249: WINDOW FUNNEL — signup → click → purchase where each stage
  *    must land within [[FunnelWindowUs]] (24 h) of the PREVIOUS
  *    stage's completion (the windowFunnel shape, per-step windows).
  *    Witness choice is GREEDY-EARLIEST: each stage completes at its
  *    earliest eligible event (`min` per user per stage — deterministic,
  *    one keyed aggregate per stage). A later witness could
  *    occasionally rescue a failing chain; the greedy witness is the
  *    DECLARED semantics, the deterministic one-pass-per-stage plan.
  *    Unlike q81's order-only funnel, the clock gates conversion: the
  *    fixture completes 150 → 65 → 29 at 24 h where the order-only
  *    funnel would saturate (every user eventually does everything —
  *    the FIXTURES.md degeneracy the window is FOR).
  *  - q250: DEDUP THRESHOLD SWEEP — the commit-a-threshold report: ONE
  *    celled pair detection at the loosest band (0.80) serves every
  *    band above it (pairs and reached docs at ≥ 0.80/0.85/0.90/0.95),
  *    so the whole sensitivity curve costs one detector run + four
  *    filters. Complements q171's histogram with the CUMULATIVE view a
  *    curator actually compares against budget, and reports reached
  *    DOCS, which no histogram re-binning can recover. Band literals
  *    parse to identical doubles in both engines; `c` itself is
  *    IEEE-identical (the celledPairSql convention).
  *
  * Scale: q249 is three keyed join+min stages over the event table —
  * each one shuffle on user_id, no windows; q250 rides the celled pair
  * source (cell-keyed candidates, exact-cosine verify) + a 4-band
  * broadcast cross — and the bench's shared-artifacts sweep drives it
  * through [[TierNineteen.CelledArtifacts.pairs]](0.8) like the rest of
  * the family.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star behavioral /
  * curation ops.
  */
object TierEightyFive {

  private[graft] val FunnelWindowUs = 86400000000L // 24 h
  private[graft] val SweepThr = Seq(0.80, 0.85, 0.90, 0.95)

  val q249 = Q("q249_window_funnel",
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |s1 AS (SELECT user_id, min(us) AS t1 FROM e
       |       WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
       |       WHERE event_type = 'click' AND us > t1 AND us <= t1 + $FunnelWindowUs
       |       GROUP BY 1),
       |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
       |       WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + $FunnelWindowUs
       |       GROUP BY 1),
       |m AS (
       |  SELECT 1 AS stage, 'signup' AS step, CAST(count(*) AS BIGINT) AS users FROM s1
       |  UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
       |  UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3),
       |base AS (SELECT users AS u1 FROM m WHERE stage = 1)
       |SELECT CAST(stage AS BIGINT) AS stage, step, users,
       |       CAST(users * 1000000 // u1 AS BIGINT) AS conv_ppm
       |FROM m CROSS JOIN base ORDER BY stage""".stripMargin) { (s, dir) =>
    funnelOver(Tables.load(s, dir, "events"),
      Seq("signup", "click", "purchase"), FunnelWindowUs)
  }

  /** q249's chained-window funnel over ANY `(user_id, event_type, ts)`
    * frame, arbitrary step list and window — the extracted library face
    * (`graft_window_funnel` SQL twin). Greedy-earliest witness per
    * stage; three bounded driver reads (one long per stage). */
  private[graft] def funnelOver(events: DataFrame, steps: Seq[String],
      windowUs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    require(steps.nonEmpty, "window funnel needs at least one step")
    val e = events
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
    def next(prev: DataFrame, step: String): DataFrame =
      e.filter(col("event_type") === step)
        .join(prev, "user_id")
        .filter(col("us") > col("t") && col("us") <= col("t") + windowUs)
        .groupBy("user_id").agg(min("us").as("t"))
    val s1 = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("us").as("t"))
    val stages = steps.tail.scanLeft(s1)(next)
    val counts = steps.zip(stages).zipWithIndex.map { case ((nm, df), i) =>
      (i + 1L, nm, df.count()) // bounded: one long per stage
    }
    val u1 = counts.head._3
    counts.map { case (st, nm, u) =>
      (st, nm, u, if (u1 == 0) 0L else u * 1000000L / u1) }
      .toDF("stage", "step", "users", "conv_ppm").orderBy("stage")
  }

  val q250 = Q("q250_threshold_sweep",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(SweepThr.head)},
       |bands AS (SELECT unnest([${SweepThr.mkString(", ")}]) AS thr)
       |SELECT CAST(thr * 1000000 AS BIGINT) AS thr_ppm,
       |       CAST(count(d) // 2 AS BIGINT) AS n_pairs,
       |       CAST(count(DISTINCT d) AS BIGINT) AS n_docs
       |FROM bands LEFT JOIN (
       |  SELECT doc_a AS d, c FROM hits UNION ALL SELECT doc_b, c FROM hits) p
       |  ON p.c >= bands.thr
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    sweepOver(TierNineteen.celledEmbedPairsOf(
      Tables.load(s, dir, "documents").select("doc_id", "text"), SweepThr.head))
  }

  /** q250's band fold over an ARBITRARY pair frame `(doc_a, doc_b, c)`
    * at the loosest band — the extracted face the shared-build bench
    * sweep drives with [[TierNineteen.CelledArtifacts.pairs]](0.8)
    * (BenchFacesSpec pins face ≡ declared query). `n_pairs` counts
    * endpoint rows 2× by construction of the union — divided back out. */
  private[graft] def sweepOver(hits: DataFrame): DataFrame = {
    val s = hits.sparkSession
    import s.implicits._
    val bands = SweepThr.toDF("thr")
    val ends = hits.select(col("doc_a").as("d"), col("c"))
      .unionAll(hits.select(col("doc_b").as("d"), col("c")))
    broadcast(bands).join(ends, col("c") >= col("thr"), "left")
      .groupBy("thr")
      .agg(count(col("d")).as("n_ends"), countDistinct(col("d")).as("n_docs"))
      .select((col("thr") * 1000000).cast("long").as("thr_ppm"),
        expr("n_ends div 2").as("n_pairs"), col("n_docs"))
      .orderBy("thr_ppm")
  }

  private[graft] def q250Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    sweepOver(art.pairs(SweepThr.head))

  val all: Seq[Q] = Seq(q249, q250)
}
