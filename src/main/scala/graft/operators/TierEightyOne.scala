package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 81 (round 13): graded retrieval evaluation + mergeable distinct
  * sketches — two gaps in the eval/sketch families.
  *
  *  - q241: nDCG@10 (Järvelin & Kekäläinen 2002) — q216's two rankers
  *    (BM25 over the eval terms; the length-desc baseline) scored with
  *    GRADED relevance: gain(doc) = its 'dup' term frequency (0/1/2 on
  *    the fixture — the graded signal binary P/R/MRR cannot see).
  *    `dcg = Σ gain_i·W(i)` with `W(i) = round(10⁶/log₂(i+1))`
  *    precomputed ONCE in Scala and embedded VERBATIM in the oracle
  *    ([[TierSixtyEight.LcEst]]'s cross-libm rule — log₂ is never
  *    evaluated at query time in either engine); `ndcg_ppm =
  *    dcg·10⁶ // idcg` against the global ideal ordering (gain DESC,
  *    doc_id ASC — ties pinned).
  *  - q242: KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002;
  *    Beyer et al., SIGMOD 2007) — the k = 32 smallest distinct values
  *    of q65's affine+square hash over the USER-DAY key
  *    (`user_id·1024 + day` — injective while day < 1024; repack for
  *    longer horizons) per event_type, plus the merged '_all' row:
  *    `est = (k−1)·P // h_k`, exact count when fewer than k distinct
  *    hashes exist. User-days (not bare user_ids) because the fixture
  *    has every user active in every type — bare ids would sketch six
  *    IDENTICAL sets; user-day activity differs per type and the '_all'
  *    row is genuinely ~3× the per-type rows (the FIXTURES.md
  *    degeneracy rule). The third exactly-oracle-checked sketch
  *    (after CountMin q54 and HLL q65/q219), and the one with the
  *    cheapest exact MERGE — union of bottom-k pools, re-truncated
  *    (the [[graft.functions.BottomK]] typed Aggregator; its merge IS
  *    the law, pinned in TierEightyOneSpec).
  *
  * Scale: q241's ranked lists are ≤ 2·k driver-side ids (the
  * q216/q235 bounded-metadata convention) over distributed rankers;
  * q242 is one distinct + one typed partial+final aggregate with O(k)
  * state per group — no windows, no sorts beyond the in-buffer k.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star eval/sketch ops.
  */
object TierEightyOne {

  import TierFour.{A0, B0, P}

  private[graft] val NdcgK = 10
  private[graft] val KmvK = 32

  /** DCG position weights `W(i) = round(10⁶/log₂(i+1))`, i = 1..k —
    * computed here once, shared verbatim by both engines (log₂ is a
    * libm call whose last bit is not cross-engine stable). */
  private[graft] val DcgW: IndexedSeq[(Int, Long)] =
    (1 to NdcgK).map(i => i -> BigDecimal(1e6 * math.log(2.0) / math.log(i + 1.0))
      .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLongExact)

  private def wSql: String =
    DcgW.map { case (i, w) => s"($i, $w)" }.mkString(", ")

  val q241 = Q("q241_ndcg_eval",
    s"""WITH toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |gains AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'dup')) AS BIGINT)
       |           AS g
       |  FROM documents),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
       |               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_toks),
       |q AS (SELECT unnest(['dup', 'spark', 'merge']) AS token),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |       FROM toks JOIN q USING (token) GROUP BY 1, 2),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |bm AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS pos
       |  FROM (
       |    SELECT doc_id,
       |           sum((tf * 2200 * ((n * 1000000) // df)) //
       |               (tf * 1000 +
       |                (1200 * (250 + (750 * ((dl * 1000) // (total_toks // n))) // 1000)) // 1000))
       |             AS score
       |    FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN tot
       |    GROUP BY 1)
       |  QUALIFY pos <= $NdcgK),
       |bl AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY dl DESC, doc_id) AS pos
       |  FROM dl QUALIFY pos <= $NdcgK),
       |w AS (SELECT * FROM (VALUES $wSql) AS wt(pos, wv)),
       |d AS (
       |  SELECT 'bm25' AS ranker, CAST(sum(gains.g * w.wv) AS BIGINT) AS dcg
       |  FROM bm JOIN gains USING (doc_id) JOIN w ON w.pos = bm.pos
       |  UNION ALL
       |  SELECT 'len_desc', CAST(sum(gains.g * w.wv) AS BIGINT)
       |  FROM bl JOIN gains USING (doc_id) JOIN w ON w.pos = bl.pos),
       |ideal AS (
       |  SELECT row_number() OVER (ORDER BY g DESC, doc_id) AS pos, g
       |  FROM gains QUALIFY pos <= $NdcgK),
       |i AS (SELECT CAST(sum(ideal.g * w.wv) AS BIGINT) AS idcg
       |      FROM ideal JOIN w USING (pos))
       |SELECT ranker, dcg, idcg,
       |       CAST(CASE WHEN idcg = 0 THEN 0
       |            ELSE dcg * 1000000 // idcg END AS BIGINT) AS ndcg_ppm
       |FROM d CROSS JOIN i ORDER BY ranker""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val gains = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "), x => x === "dup")).cast("long").as("g"))
    // bounded driver reads (the q216/q235 rank-list convention): two ≤ k
    // id lists, their ≤ 2k gains, and the global top-k ideal gains
    val bm = TierSixtySix.bm25TopK(s, dir, TierSixtySix.EvalTerms, NdcgK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val bl = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("dl"))
      .orderBy(col("dl").desc, col("doc_id").asc).limit(NdcgK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rankedIds = (bm ++ bl).distinct
    val gmap = gains.filter(col("doc_id").isin(rankedIds: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idealG = gains.orderBy(col("g").desc, col("doc_id").asc).limit(NdcgK)
      .collect().map(_.getLong(1)).toSeq
    val wByPos = DcgW.toMap
    def dcg(gs: Seq[Long]): Long =
      gs.zipWithIndex.map { case (g, i) => g * wByPos(i + 1) }.sum
    val idcg = dcg(idealG)
    val rows = Seq("bm25" -> bm, "len_desc" -> bl).map { case (name, ranked) =>
      val d = dcg(ranked.map(gmap))
      (name, d, idcg, if (idcg == 0) 0L else d * 1000000L / idcg)
    }
    rows.toDF("ranker", "dcg", "idcg", "ndcg_ppm").orderBy("ranker")
  }

  /** q242's hash projection `(event_type, h)` over ANY `(event_type,
    * user_id, ts, …)` frame — ONE definition for the batch sketch and
    * the live [[graft.streaming.KmvMonitor]] feed (the q189/s39
    * cannot-drift rule). NOT deduplicated: the sketch's bottom-k insert
    * is itself the dedupe. */
  private[graft] def udayHashes(events: DataFrame): DataFrame =
    TierNine.hllWithH(
      events.select(col("event_type"),
        (col("user_id") * 1024L +
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")).as("uday")),
      col("uday"))
      .select(col("event_type"), col("h"))

  /** The KMV readout from a bottom-k window: `(n_kept, kth_hash, est)` —
    * the Scala mirror of q242's in-plan expression, shared with the live
    * monitor (parity pinned by s47). */
  private[graft] def kmvEstOf(bottom: Seq[Long]): (Long, Long, Long) = {
    val n = bottom.size.toLong
    val kth = bottom.last
    (n, kth, if (n < KmvK) n else (KmvK - 1).toLong * TierFour.P / kth)
  }

  val q242 = Q("q242_kmv_sketch",
    s"""WITH ud AS (
       |  SELECT event_type,
       |         user_id * 1024 + epoch_us(ts) // 86400000000 AS uday
       |  FROM events),
       |h0 AS (SELECT event_type, ((uday % $P) * $A0 + $B0) % $P AS h0 FROM ud),
       |hh AS (SELECT DISTINCT event_type, (h0 * h0) % $P AS h FROM h0),
       |ha AS (SELECT event_type, h FROM hh
       |       UNION ALL SELECT DISTINCT '_all' AS event_type, h FROM hh),
       |bk AS (
       |  SELECT event_type, h,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |  FROM ha QUALIFY rk <= $KmvK)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
       |       CAST(max(h) AS BIGINT) AS kth_hash,
       |       CAST(CASE WHEN count(*) < $KmvK THEN count(*)
       |            ELSE ${(KmvK - 1).toLong * P} // max(h) END AS BIGINT) AS est
       |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val hashed = udayHashes(Tables.load(s, dir, "events")).distinct()
    val withAll = hashed.unionAll(
      hashed.select(lit("_all").as("event_type"), col("h")).distinct())
    val bk = withAll.as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.BottomK(KmvK).toColumn.name("bottom"))
      .toDF("event_type", "bottom")
    bk.select(col("event_type"),
        size(col("bottom")).cast("long").as("n_kept"),
        array_max(col("bottom")).as("kth_hash"))
      .withColumn("est",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(expr(s"${(KmvK - 1).toLong * P} div kth_hash")))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q241, q242)
}
