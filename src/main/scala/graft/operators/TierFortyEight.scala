package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 48 (round 10, twentieth wave): the classifier-diagnostic joint
  * table and the classic RFM segmentation.
  *
  *  - q180: LENGTH × QUALITY JOINT DECILES — doc counts over (ws-token
  *    decile × classifier-score decile): the "is our quality filter
  *    just a length filter?" diagnostic (a diagonal-heavy table says
  *    yes). Both decile cuts are EXACT distributed ranks
  *    ([[Cumulative.rowNumber]], ties pinned by doc_id) — decile d =
  *    ((rank−1)·10) div n, so margins are balanced by construction
  *    (spec-pinned within ±1).
  *  - q181: RFM SEGMENTS — each user's (Recency, Frequency, Monetary)
  *    tercile code (exact ranks, pinned ties) and the per-segment
  *    counts: the CRM segmentation grid. Recency ranks ascending from
  *    the window end (0 = most recent), frequency/monetary descending
  *    (0 = best) — code 000 is the best customers.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFortyEight {

  val q180 = Q("q180_length_quality_grid",
    s"""WITH toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |vocab AS (
       |  SELECT token, row_number() OVER (ORDER BY token) AS tid
       |  FROM (SELECT DISTINCT token FROM toks)),
       |wts AS (
       |  SELECT b AS bucket,
       |         CAST(((b * ${TierFour.A0} + ${TierFour.B0}) % ${TierFour.P}) % 2001 - 1000 AS BIGINT) AS w
       |  FROM (SELECT unnest(range(4096)) AS b)),
       |feat AS (
       |  SELECT doc_id, ((tid % ${TierFour.P}) * ${TierFour.A0} + ${TierFour.B0}) % ${TierFour.P} % 4096 AS bucket
       |  FROM toks JOIN vocab USING (token)),
       |sc AS (
       |  SELECT d.doc_id,
       |         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
       |         CAST(coalesce(sum(w), 0) AS BIGINT) AS score_c
       |  FROM documents d
       |  LEFT JOIN feat ON feat.doc_id = d.doc_id
       |  LEFT JOIN wts ON wts.bucket = feat.bucket
       |  GROUP BY 1, 2),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc),
       |r AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS lr,
       |         CAST(row_number() OVER (ORDER BY score_c, doc_id) AS BIGINT) AS qr
       |  FROM sc)
       |SELECT ((r.lr - 1) * 10) // n.n AS len_decile,
       |       ((r.qr - 1) * 10) // n.n AS score_decile,
       |       CAST(count(*) AS BIGINT) AS n_docs
       |FROM r, n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val sc = TierEleven.classifierScores(s, dir)
      .join(docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tok")),
        "doc_id")
    val n = sc.count() // documented 1-long driver read (the q169 pattern)
    val lr = Cumulative.rowNumber(s, sc, Seq(col("n_tok"), col("doc_id")), "lr")
    val both = Cumulative.rowNumber(s, lr, Seq(col("score_c"), col("doc_id")), "qr")
    both
      .select(expr(s"((lr - 1) * 10) div $n").as("len_decile"),
        expr(s"((qr - 1) * 10) div $n").as("score_decile"))
      .groupBy("len_decile", "score_decile")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("len_decile", "score_decile")
  }

  val q181 = Q("q181_rfm_segments",
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS d,
      |         event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |mx AS (SELECT max(d) AS wend FROM ev),
      |u AS (
      |  SELECT ev.user_id,
      |         CAST(mx.wend - max(ev.d) AS BIGINT) AS recency_d,
      |         CAST(count(*) AS BIGINT) AS freq,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT)
      |           AS monetary
      |  FROM ev CROSS JOIN mx GROUP BY ev.user_id, mx.wend),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
      |r AS (
      |  SELECT user_id,
      |         CAST(row_number() OVER (ORDER BY recency_d, user_id) AS BIGINT) AS rr,
      |         CAST(row_number() OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS fr,
      |         CAST(row_number() OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS mr
      |  FROM u)
      |SELECT ((r.rr - 1) * 3) // n.n AS r_code,
      |       ((r.fr - 1) * 3) // n.n AS f_code,
      |       ((r.mr - 1) * 3) // n.n AS m_code,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM r, n GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"),
        col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
    val wend = ev.agg(max("d")).head().getLong(0) // documented 1-long driver read
    val u = ev.groupBy("user_id")
      .agg((lit(wend) - max("d")).as("recency_d"),
        count(lit(1)).as("freq"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
          .as("monetary"))
    val n = u.count()
    val r1 = Cumulative.rowNumber(s, u, Seq(col("recency_d"), col("user_id")), "rr")
    val r2 = Cumulative.rowNumber(s, r1, Seq((-col("freq")).as("nf"), col("user_id")), "fr")
    val r3 = Cumulative.rowNumber(s, r2, Seq((-col("monetary")).as("nm"), col("user_id")), "mr")
    r3.select(expr(s"((rr - 1) * 3) div $n").as("r_code"),
        expr(s"((fr - 1) * 3) div $n").as("f_code"),
        expr(s"((mr - 1) * 3) div $n").as("m_code"))
      .groupBy("r_code", "f_code", "m_code")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r_code", "f_code", "m_code")
  }

  val all: Seq[Q] = Seq(q180, q181)
}
