package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 6 — round-3 additions: the native as-of join (custom Catalyst
  * operator, q45) and corpus-analysis operators a training-data pipeline
  * runs constantly: vocabulary Zipf profile, benchmark-contamination
  * check, stratified sampling, intra-document repetition, length
  * histograms. All are single-agg / broadcast-join plans that scale
  * embarrassingly; determinism follows the Tier-3/4 conventions
  * (integer arithmetic, pinned orders, round(,6) only at the boundary).
  */
object TierSix {

  /** Native as-of join ([[graft.plans.AsOfJoin]]): same query as q42 —
    * each error event's most recent same-user purchase strictly before it
    * in the (ts, event_id) total order — but planned as the custom
    * operator instead of the union+window composition. One co-partitioned
    * merge pass, O(1) state per task (see AsOfJoinExec scaladoc); the
    * oracle is q42's, verbatim, because the semantics are pinned
    * identical ([[graft.AsofPlanSpec]] asserts row equality with q42 and
    * the plan shape).
    */
  val q45 = Q("q45_asof_native",
    """WITH u AS (
      |  SELECT event_id, user_id, ts, event_type,
      |         CASE WHEN event_type = 'purchase' THEN event_id END AS pid
      |  FROM events),
      |m AS (
      |  SELECT event_id, user_id, event_type,
      |         last_value(pid IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_id
      |  FROM u)
      |SELECT event_id, last_purchase_id FROM m WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    graft.plans.Asof.join(errors, purchases,
        Seq("user_id"), Seq("p_user"), Seq("ts", "event_id"), Seq("p_ts", "pid"))
      .select(col("event_id"), col("pid").as("last_purchase_id"))
      .orderBy("event_id")
  }

  /** Vocabulary Zipf profile: the top-20 tokens by frequency with
    * parts-per-million share — the first plot anyone makes of a new
    * corpus. One partial+final count agg and a broadcast 1-row total;
    * top-k is TakeOrderedAndProject, never a global sort.
    */
  val q46 = Q("q46_zipf_topk",
    """WITH tf AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> '' GROUP BY 1),
      |tot AS (SELECT sum(cnt) AS tot FROM tf)
      |SELECT token, cnt, CAST((cnt * 1000000) // tot AS BIGINT) AS ppm
      |FROM tf CROSS JOIN tot
      |ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
    val tf = Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = tf.agg(sum("cnt").as("tot"))
    tf.crossJoin(broadcast(tot))
      .select(col("token"), col("cnt"), expr("cnt * 1000000 div tot").as("ppm"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
  }

  /** Benchmark-contamination check: which documents share word trigrams
    * with a (literal, in-query) evaluation set — the pre-training hygiene
    * scan that keeps eval data out of the training corpus. The eval side
    * is always tiny → its distinct shingles BROADCAST, and the corpus
    * side is one shingle scan + broadcast hash join: no shuffle of the
    * corpus at any scale. Counts per eval item: contaminated docs and
    * distinct (doc, trigram) hits.
    */
  val q47 = Q("q47_contamination",
    """WITH ev(eval_id, etext) AS (VALUES
      |  (0, 'data table join fast query scan row value'),
      |  (1, 'the big window agg group sort merge batch'),
      |  (2, 'spark stream filter key hash part column line')),
      |et AS (
      |  SELECT DISTINCT eval_id, t FROM (
      |    SELECT eval_id, unnest(list_transform(range(len(l) - 2),
      |      k -> l[k+1] || ' ' || l[k+2] || ' ' || l[k+3])) AS t
      |    FROM (SELECT eval_id, list_filter(string_split(etext, ' '), x -> x <> '') AS l
      |          FROM ev))),
      |dt AS (
      |  SELECT DISTINCT doc_id, t FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(l) - 2),
      |      k -> l[k+1] || ' ' || l[k+2] || ' ' || l[k+3])) AS t
      |    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |          FROM documents)))
      |SELECT CAST(eval_id AS BIGINT) AS eval_id,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(count(*) AS BIGINT) AS n_hits
      |FROM dt JOIN et USING (t) GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    def trigrams(df: org.apache.spark.sql.DataFrame, id: String, text: String) =
      df.select(col(id), filter(split(col(text), " "), x => x =!= "").as("l"))
        .filter(size(col("l")) >= 3) // guard: sequence() descends on short docs
        .select(col(id),
          explode(transform(sequence(lit(0), size(col("l")) - 3),
            k => concat_ws(" ", element_at(col("l"), k + 1),
              element_at(col("l"), k + 2), element_at(col("l"), k + 3)))).as("t"))
        .distinct()
    val ev = s.sql(
      """SELECT * FROM VALUES
        |  (0, 'data table join fast query scan row value'),
        |  (1, 'the big window agg group sort merge batch'),
        |  (2, 'spark stream filter key hash part column line') AS t(eval_id, etext)""".stripMargin)
    val et = trigrams(ev, "eval_id", "etext")
    val dt = trigrams(Tables.load(s, dir, "documents"), "doc_id", "text")
    // two-level agg instead of countDistinct+count in one (which plans an
    // Expand — ×2 row multiplication over every matched pair): first fold
    // to (eval, doc), then count docs and sum hits — narrow shuffles only
    dt.join(broadcast(et), "t")
      .groupBy(col("eval_id").cast("long").as("eval_id"), col("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_docs"), sum("hits").as("n_hits"))
      .orderBy("eval_id")
  }

  /** Stratified deterministic sampling: a 10% per-language sample drawn by
    * affine hash of doc_id — no sort, no randomness, retry-stable, and the
    * same rows come out on any cluster size (the 100 TB sampling shape:
    * a codegen'd filter). Output proves the stratification: per language,
    * total vs sampled counts.
    */
  val q48 = Q("q48_stratified_sample",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(sum(CASE WHEN (2654435761 * doc_id + 40503) % 2147483647 % 100 < 10
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when((lit(2654435761L) * col("doc_id") + 40503L) % 2147483647L % 100 < 10, 1L)
          .otherwise(0L)).as("n_sampled"))
      .orderBy("lang")
  }

  /** Intra-document repetition score: the share of a document's bigrams
    * taken by its single most repeated bigram — the standard "repetitive
    * junk" quality filter (boilerplate, keyword stuffing). Two narrow
    * aggs, shuffle key doc_id; docs with <2 tokens have no bigrams and
    * drop out on both engines.
    */
  val q49 = Q("q49_repetition_score",
    """WITH arr AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(len(l) - 1),
      |    k -> l[k+1] || ' ' || l[k+2])) AS b FROM arr),
      |c AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      |       CAST(max(cnt) AS BIGINT) AS max_rep,
      |       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS rep_ratio
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val bg = Tables.load(s, dir, "documents")
      .select(col("doc_id"), filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) >= 2) // guard: sequence() descends on short docs
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("l")) - 2),
          k => concat_ws(" ", element_at(col("l"), k + 1), element_at(col("l"), k + 2))))
          .as("b"))
    bg.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_bigrams"), max("cnt").as("max_rep"),
        round(max("cnt").cast("double") / sum("cnt"), 6).as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Corpus length histogram: fixed-width 50-char buckets (capped at
    * bucket 9) over document length — integer bucketing, one partial+final
    * agg, the cheapest possible full-corpus profile.
    */
  val q50 = Q("q50_length_histogram",
    """SELECT CAST(least(n_chars // 50, 9) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .groupBy(expr("least(n_chars div 50, 9)").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket")
  }

  val all: Seq[Q] = Seq(q45, q46, q47, q48, q49, q50)
}
