package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 64 (round 11, thirteenth wave): per-document keyword extraction
  * and the unpivot/melt — one LLM-pipeline text op, one relational
  * completion.
  *
  *  - q211: TF-IDF KEYWORDS — each document's top-3 characteristic
  *    terms: score = tf · idf with the exact-integer idf ratio
  *    idf_ppm = 10⁶·N div df (the deterministic variant of log-idf —
  *    monotone in N/df, so the top-k set matches the float form
  *    whenever no rank straddles a log compression; pinned tie-break
  *    token asc). tf from one (doc, token) count, df from one distinct
  *    count, N a bounded 1-row scalar; ranks via `row_number` over the
  *    PER-DOCUMENT window — partitioned by doc_id, so the window state
  *    is bounded per key (the q154 top-3 convention), never a global
  *    sort. The extractive-keyword op a corpus indexer/labeler runs.
  *  - q212: UNPIVOT (MELT) — the inverse of q39's pivot as a declared
  *    operator: the SAME pinned-domain wide frame melts back to
  *    (hour, event_type, n_events) long form via Spark's native
  *    `unpivot` (one Expand projection — no shuffle, no join), zero
  *    cells dropped so melt(pivot(x)) ≡ x exactly (the roundtrip law,
  *    spec-pinned on a constructed frame WITH an empty cell; the
  *    fixture populates all 120 cells at both SFs — probed). Oracle is
  *    the direct long-form GROUP BY — the melt must reproduce what the
  *    pivot started from.
  *
  * Scale: q211 is two keyed aggs + one broadcast-sized df join keyed by
  * token (vocabulary-cardinality — the q83 model-join shape) + a
  * per-doc bounded window; q212's Expand multiplies rows ×5 at
  * metadata cost only (column count), partition-local.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star text /
  * relational ops.
  */
object TierSixtyFour {

  val q211 = Q("q211_tfidf_keywords",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |           AS token
      |  FROM documents),
      |tfq AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |        FROM toks GROUP BY 1, 2),
      |dfq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |        FROM toks GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |sc AS (
      |  SELECT doc_id, token, tf, df,
      |         CAST(tf * (1000000 * nn.n // df) AS BIGINT) AS score
      |  FROM tfq JOIN dfq USING (token) CROSS JOIN nn),
      |rk AS (SELECT *, CAST(row_number() OVER
      |         (PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rk
      |       FROM sc)
      |SELECT doc_id, rk, token, tf, df, score
      |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " "), x => x =!= "")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfq = toks.distinct().groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.count() // bounded 1-row scalar (q184 convention)
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.join(dfq, "token")
      .withColumn("score", expr(s"tf * ((1000000 * ${n}L) div df)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "token", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }

  /** q39's pinned pivot domain — the melt must agree with the pivot on
    * the value-column order. */
  private[graft] val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Melt a q39-shaped wide frame back to long form, dropping zero
    * cells (the pivot's `na.fill(0)` placeholders — absent in the long
    * form the pivot started from, so melt ∘ pivot ≡ id). */
  private[graft] def melt(wide: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    wide.unpivot(Array(col("hour")), PivotTypes.map(col).toArray,
        "event_type", "n_events")
      .filter(col("n_events") =!= 0)

  val q212 = Q("q212_unpivot_melt",
    """SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
      |       event_type, CAST(count(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    melt(TierFive.q39.run(s, dir)).orderBy("hour", "event_type")
  }

  val all: Seq[Q] = Seq(q211, q212)
}
