package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 93 (round 13): two rank-list metrics the retrieval-eval family
  * (q216 P/R/MRR, q241 nDCG, q235 RRF) still lacked — top-weighted
  * AGREEMENT between two rankers, and a cascade-model utility of one.
  *
  *  - q265: RANK-BIASED OVERLAP @10 (Webber, Moffat & Zobel 2010, the
  *    finite-prefix base form) — how much the BM25 ranking and the
  *    TTR quality-prior ranking agree, weighted toward the top:
  *    `RBO = Σ_{d≤10} (1−p)p^{d−1}·(X_d/d)` with persistence p = 0.9
  *    and X_d the overlap of the two depth-d prefixes. The depth
  *    weights are SCALA-COMPUTED ppb literals shared verbatim by both
  *    engines (the q241 log₂-literal convention — `pow` never runs at
  *    query time), and each term is one truncating division; overlap
  *    counts come from the two ≤10-id rank lists (the q216/q235
  *    bounded-read convention — rank lists ARE metadata).
  *  - q266: EXPECTED RECIPROCAL RANK @10 (Chapelle et al. CIKM 2009) —
  *    the cascade-model utility of the BM25 ranking under q241's
  *    graded gains (dup-term frequency, capped at grade 4):
  *    `ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i)`, `R = (2^g−1)/16`. ALL
  *    EXACT: the prefix product of (16 − (2^g−1)) is carried as an
  *    integer over the implicit 16^r denominator (BigInt driver
  *    closure; `WITH RECURSIVE` + HUGEINT oracle), each term floored
  *    at ppb — where q241's nDCG rewards total gain, ERR models the
  *    user who STOPS at the first good hit.
  *
  * Scale: both rankers are the q82-shape broadcast-term plans ending in
  * TakeOrdered; everything after touches ≤10-id metadata.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star retrieval-eval
  * ops.
  */
object TierNinetyThree {

  private[graft] val RboK = 10
  /** ppb depth weights round(10⁹·(1−p)·p^{d−1}), p = 0.9 — computed here
    * once, interpolated into BOTH engines as literals. */
  private[graft] val RboW: Seq[Long] =
    (1 to RboK).map(d => math.round(1e9 * 0.1 * math.pow(0.9, d - 1)))

  /** The two ≤k-id rank lists q265 compares (BM25, TTR) — shared with
    * the spec. */
  private[graft] def rankLists(s: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[Long], Seq[Long]) = {
    val bm = TierSixtySix.bm25TopK(s, dir, TierSixtySix.EvalTerms, RboK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val tq = TierSeventyEight.ttrTopK(
        Tables.load(s, dir, "documents"), RboK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    (bm, tq)
  }

  private def bmCte(k: Int): String =
    s"""toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
       |               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_toks),
       |q AS (SELECT unnest(['dup', 'spark', 'merge']) AS token),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |       FROM toks JOIN q USING (token) GROUP BY 1, 2),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |bm AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS pos
       |  FROM (
       |    SELECT doc_id,
       |           sum((tf * 2200 * ((n * 1000000) // df)) //
       |               (tf * 1000 +
       |                (1200 * (250 + (750 * ((dl * 1000) // (total_toks // n))) // 1000)) // 1000))
       |             AS score
       |    FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN tot
       |    GROUP BY 1)
       |  QUALIFY pos <= $k)""".stripMargin

  val q265 = Q("q265_rbo",
    s"""WITH ${bmCte(RboK)},
       |tq AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY ttr_ppm DESC, doc_id) AS BIGINT) AS pos
       |  FROM (
       |    SELECT doc_id,
       |           (CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) * 1000000)
       |             // CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ttr_ppm
       |    FROM documents
       |    WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0)
       |  QUALIFY pos <= $RboK),
       |w(d, wd) AS (VALUES ${RboW.zipWithIndex
            .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")}),
       |x AS (
       |  SELECT w.d, CAST(count(j.pa) AS BIGINT) AS xd
       |  FROM w LEFT JOIN (
       |    SELECT bm.pos AS pa, tq.pos AS pb
       |    FROM bm JOIN tq ON tq.doc_id = bm.doc_id) j
       |    ON j.pa <= w.d AND j.pb <= w.d
       |  GROUP BY 1)
       |SELECT CAST(w.d AS BIGINT) AS d, x.xd AS x_d,
       |       CAST((w.wd * x.xd) // w.d AS BIGINT) AS term_ppb,
       |       CAST(sum((w.wd * x.xd) // w.d) OVER (ORDER BY w.d) AS BIGINT)
       |         AS rbo_cum_ppb
       |FROM w JOIN x ON x.d = w.d ORDER BY d""".stripMargin) { (s, dir) =>
    import s.implicits._
    val (bm, tq) = rankLists(s, dir)
    rboRows(bm, tq).toDF("d", "x_d", "term_ppb", "rbo_cum_ppb")
  }

  /** q265's depth fold over two rank lists — shared with the spec. */
  private[graft] def rboRows(bm: Seq[Long], tq: Seq[Long])
      : Seq[(Long, Long, Long, Long)] = {
    val bmPos = bm.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val tqPos = tq.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    var cum = 0L
    (1 to RboK).map { d =>
      val xd = bm.count(id => bmPos(id) <= d && tqPos.getOrElse(id, RboK + 1) <= d)
        .toLong
      val term = RboW(d - 1) * xd / d
      cum += term
      (d.toLong, xd, term, cum)
    }
  }

  val q266 = Q("q266_err",
    s"""WITH RECURSIVE ${bmCte(RboK)},
       |gains AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'dup')) AS BIGINT)
       |           AS g
       |  FROM documents),
       |br AS (
       |  SELECT bm.pos, bm.doc_id, gains.g,
       |         CASE WHEN gains.g >= 4 THEN 15 WHEN gains.g = 3 THEN 7
       |              WHEN gains.g = 2 THEN 3 WHEN gains.g = 1 THEN 1
       |              ELSE 0 END AS rnum
       |  FROM bm JOIN gains ON gains.doc_id = bm.doc_id),
       |rec AS (
       |  SELECT pos, doc_id, g,
       |         CAST(16 AS HUGEINT) AS pden,
       |         CAST(16 - rnum AS HUGEINT) AS pnum,
       |         CAST((1000000000 * CAST(rnum AS HUGEINT)) // 16 AS BIGINT) AS term
       |  FROM br WHERE pos = 1
       |  UNION ALL
       |  SELECT b.pos, b.doc_id, b.g,
       |         r.pden * 16,
       |         r.pnum * (16 - b.rnum),
       |         CAST((1000000000 * CAST(b.rnum AS HUGEINT) * r.pnum)
       |              // (r.pden * 16 * b.pos) AS BIGINT)
       |  FROM rec r JOIN br b ON b.pos = r.pos + 1)
       |SELECT pos, doc_id, g, term AS term_ppb,
       |       CAST(sum(term) OVER (ORDER BY pos) AS BIGINT) AS err_cum_ppb
       |FROM rec ORDER BY pos""".stripMargin) { (s, dir) =>
    import s.implicits._
    val bm = TierSixtySix.bm25TopK(s, dir, TierSixtySix.EvalTerms, RboK)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val docs = Tables.load(s, dir, "documents")
    val gmap = docs.filter(col("doc_id").isin(bm: _*))
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x === "dup"))
          .cast("long").as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    errRows(bm, gmap).toDF("pos", "doc_id", "g", "term_ppb", "err_cum_ppb")
  }

  /** q266's exact cascade fold over a rank list + its grades — shared
    * with the spec. */
  private[graft] def errRows(bm: Seq[Long], gmap: Map[Long, Long])
      : Seq[(Long, Long, Long, Long, Long)] = {
    var pnum = BigInt(1); var pden = BigInt(1); var cum = 0L
    bm.zipWithIndex.map { case (id, i) =>
      val pos = i + 1L
      val g = gmap.getOrElse(id, 0L)
      val rnum = (1L << math.min(g, 4L)) - 1
      pden *= 16
      val term = (BigInt(1000000000L) * rnum * pnum / (pden * pos)).toLong
      pnum *= (16 - rnum)
      cum += term
      (pos, id, g, term, cum)
    }
  }

  val all: Seq[Q] = Seq(q265, q266)
}
