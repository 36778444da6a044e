package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 14 (round 8): CROSS-DOCUMENT substring-level deduplication — the
  * "same boilerplate pasted into thousands of pages" problem (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL'22,
  * which removes repeated ~50-token substrings corpus-wide). q89/q90
  * handle repeats WITHIN a document; this tier finds token spans shared
  * ACROSS documents and strips every copy except the canonical (min
  * doc_id) owner's — completing the dedup family's third granularity:
  * document (q22/q26), embedding (q69/q100), substring (here).
  *
  * Method: positional 8-token shingles; a shingle key held by ≥ 2 distinct
  * documents marks all its occurrences; overlapping/adjacent marked
  * shingle intervals merge into maximal spans (gaps-and-islands over the
  * matched rows only). The spans are detection output (q101); the strip
  * (q102) removes the union of covered token positions in every
  * NON-canonical document, exactly q90's apply mechanics.
  *
  * Scale: the one corpus-sized stage is the shingle shuffle (group/join on
  * the 8-gram key — same economics as q28's shingle stage). Everything
  * after operates on MATCHED shingles only, and the islands window
  * partitions by doc_id (never a global sort). A production run at 100 TB
  * would pre-hash keys to 64-bit (xxhash64) to cut shuffle bytes ~8×; the
  * declared query keeps the string key so the DuckDB oracle is exact —
  * collision-free and engine-identical.
  *
  * Reference mapping: no equivalent in the reference (its surface stops at
  * windowed tweet counts, SURVEY.md §2.1); north-star LLM-pipeline ops.
  */
object TierFourteen {

  private val W = 8 // shingle width in tokens

  /** (doc_id, s, key): every positional 8-gram of every document, s
    * 0-based. One corpus tokenize, no shuffle (pure codegen'd projection +
    * explode). */
  private def grams(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) >= W)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("l")) - (W - 1)),
          i => concat_ws(" ", slice(col("l"), i, lit(W))))).as(Seq("s", "key")))

  /** Shingle keys held by ≥ 2 distinct docs, with the canonical owner
    * (min doc_id). Two-level aggregation: per-(key, doc) distinct first,
    * so the per-key count is over docs, not occurrences. */
  private def sharedKeys(g: DataFrame): DataFrame =
    g.select("key", "doc_id").distinct()
      .groupBy("key")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("owner"))
      .filter(col("n_docs") >= 2)

  /** Merge matched shingle intervals [s, s+W-1] into maximal spans per
    * doc — gaps-and-islands: a row opens a new island iff its start lies
    * beyond every previous interval's end + 1. Runs over MATCHED rows
    * only; the window partitions by doc_id. */
  private def islands(matched: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("s")
    matched
      .withColumn("e", col("s") + (W - 1))
      .withColumn("brk",
        when(col("s") > coalesce(
          max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-2)) + 1, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy("doc_id", "island")
      .agg(min(col("s")).cast("long").as("span_start"),
        max(col("e")).cast("long").as("span_end"))
  }

  private val toksSql =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |  FROM documents),
      |g AS (SELECT doc_id, unnest(range(0, len(l) - 7)) AS s, l
      |      FROM toks WHERE len(l) >= 8),
      |k AS (SELECT doc_id, s, array_to_string(l[s + 1:s + 8], ' ') AS key FROM g)""".stripMargin

  /** Cross-doc repeated spans: every maximal token span whose 8-gram
    * shingles all occur in at least one OTHER document. Output
    * `(doc_id, span_start, span_end)`, positions 0-based inclusive. */
  val q101 = Q("q101_cross_doc_spans",
    s"""WITH $toksSql,
       |x AS (SELECT key FROM k GROUP BY key HAVING count(DISTINCT doc_id) >= 2),
       |m AS (SELECT doc_id, s, s + 7 AS e FROM k JOIN x USING (key)),
       |i AS (
       |  SELECT doc_id, s, e,
       |         CASE WHEN s > coalesce(max(e) OVER (
       |             PARTITION BY doc_id ORDER BY s
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
       |           THEN 1 ELSE 0 END AS brk
       |  FROM m),
       |isl AS (
       |  SELECT doc_id, s, e,
       |         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
       |                        ROWS UNBOUNDED PRECEDING) AS island
       |  FROM i)
       |SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
       |       CAST(max(e) AS BIGINT) AS span_end
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
    val g = grams(s, dir)
    val matched = g.join(sharedKeys(g).select("key"), "key").select("doc_id", "s")
    islands(matched)
      .select("doc_id", "span_start", "span_end")
      .orderBy("doc_id", "span_start")
  }

  /** Cross-doc span STRIP — keep-first-occurrence apply: a matched
    * shingle is FOREIGN when its document is not the key's canonical
    * owner (min doc_id); the union of foreign-covered token positions is
    * removed and the survivors rejoin in order (q90's anti-join +
    * per-doc rebuild). The canonical copy of every repeated region
    * survives untouched, so no content is lost corpus-wide — the Lee et
    * al. semantic, where q90 is the strip-everywhere variant.
    */
  val q102 = Q("q102_cross_doc_strip",
    s"""WITH $toksSql,
       |own AS (SELECT key, min(doc_id) AS owner FROM k GROUP BY key),
       |f AS (SELECT k.doc_id, k.s FROM k JOIN own USING (key)
       |      WHERE k.doc_id > own.owner),
       |cov AS (SELECT DISTINCT doc_id, s + d AS p
       |        FROM f, (SELECT unnest(range(0, 8)) AS d)),
       |tp AS (SELECT doc_id, unnest(range(0, len(l))) AS p, l
       |       FROM toks WHERE len(l) > 0),
       |tok1 AS (SELECT doc_id, p, l[p + 1] AS token FROM tp),
       |kept AS (
       |  SELECT t.doc_id, t.p, t.token FROM tok1 t
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.p = t.p)),
       |rebuilt AS (
       |  SELECT doc_id, array_to_string(list(token ORDER BY p), ' ') AS clean_text,
       |         CAST(count(*) AS BIGINT) AS n_kept
       |  FROM kept GROUP BY 1)
       |SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
       |       CAST(len(t.l) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
       |FROM toks t LEFT JOIN rebuilt r USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    stripForeignSpans(Tables.load(s, dir, "documents"))
  }

  /** The strip as a LIBRARY call over any `(doc_id, text, …)` frame —
    * `(doc_id, clean_text, n_removed)`, every input doc present. Persists
    * route through `pins` so an embedding pipeline ([[Prepare.corpus]]'s
    * optional substring stage) can release; the default throwaway
    * collector matches the Verify/Bench sweep convention. */
  def stripForeignSpans(docs: DataFrame, pins: Pins = new Pins): DataFrame = {
    // one corpus tokenize feeds the shingle stage, the position explode,
    // and the final left join (q90's persist convention)
    val toks = pins(docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("l")))
    val g = toks.filter(size(col("l")) >= W)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("l")) - (W - 1)),
          i => concat_ws(" ", slice(col("l"), i, lit(W))))).as(Seq("s", "key")))
    val foreign = g.join(sharedKeys(g).select("key", "owner"), "key")
      .filter(col("doc_id") > col("owner"))
      .select("doc_id", "s")
    // covered positions: |foreign|·8 rows — the cut list, not the corpus
    val covered = foreign
      .select(col("doc_id"), explode(sequence(col("s"), col("s") + (W - 1))).as("p"))
    val tok1 = toks.filter(size(col("l")) > 0)
      .select(col("doc_id"), posexplode(col("l")).as(Seq("p", "token")))
    val rebuilt = tok1.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(p, token))), x -> x.token), ' ')")
        .as("clean_text"),
        count(lit(1)).as("n_kept"))
    toks.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (size(col("l")) - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /** Winnowed-fingerprint OVERLAP pairs — what q33's stored artifact
    * exists for (Schleimer-Wilkerson-Aiken winnowing, SIGMOD'03): the copy
    * detector joins documents on the ~1/16 deterministic sample of their
    * trigram hashes (h ≡ 0 mod 16), never the full shingle sets — the
    * index stores 6% of the corpus's shingle volume and the pair join's
    * shuffle shrinks by the same factor, which is the entire point of
    * winnowing at 100 TB. Output: pairs sharing ≥ 2 winnowed prints with
    * the integer containment ppm `shared·10⁶ div min(|A|,|B|)` (q52's
    * asymmetric-overlap convention on the sampled sets).
    */
  val q103 = Q("q103_fingerprint_overlap",
    s"""WITH ${TierFour.tokSql},
       |arr AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, split_part(sgl, '|', 1) AS t1, split_part(sgl, '|', 2) AS t2,
       |         split_part(sgl, '|', 3) AS t3
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(l) - 2),
       |      k -> l[k+1] || '|' || l[k+2] || '|' || l[k+3])) AS sgl FROM arr)),
       |h AS (
       |  SELECT DISTINCT doc_id, (v1.tid*131*131 + v2.tid*131 + v3.tid) % 2147483647 AS h
       |  FROM sh JOIN vocab v1 ON v1.token = t1
       |          JOIN vocab v2 ON v2.token = t2
       |          JOIN vocab v3 ON v3.token = t3),
       |w AS (SELECT doc_id, h FROM h WHERE h % 16 = 0),
       |sz AS (SELECT doc_id, count(*) AS nw FROM w GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared,
       |       CAST(n_shared * 1000000 // least(sa.nw, sb.nw) AS BIGINT) AS overlap_ppm
       |FROM p JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
       |WHERE n_shared >= 2 ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    val w = TierFour.trigramHashes(s, dir)
      .filter(col("h") % 16 === 0)
      .persist() // feeds sizes AND both sides of the pair join
    val sz = w.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    w.select(col("doc_id").as("doc_a"), col("h"))
      .join(w.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(sz.select(col("doc_id").as("doc_a"), col("nw").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("nw").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        expr("n_shared * 1000000 div least(na, nb)").as("overlap_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** PRIORITY-policy cluster dedup — q58's keep-min-id survivor rule made
    * pluggable: the survivor of each near-dup cluster is the doc with the
    * MOST tokens (the keep-the-most-complete-copy production policy; ties
    * break to the larger doc_id — one deterministic struct-max per
    * cluster, q10's arg-max convention, no window). Exact dedup first,
    * then clusters over the MinHash pair graph, exactly q58's composition;
    * only the final selection differs, so the two queries pin the policy
    * boundary externally. Output: one row per cluster
    * `(cluster, doc_id, n_tokens)`.
    */
  val q104 = Q("q104_priority_dedup",
    s"""WITH RECURSIVE
       |exact_surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
       |corpus AS (
       |  SELECT d.doc_id, d.text FROM documents d JOIN exact_surv USING (doc_id)),
       |pairs AS (${TierFour.minhashSql("corpus")}),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT doc_id AS id FROM corpus),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |tokc AS (
       |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM corpus),
       |rk AS (
       |  SELECT l.lbl AS cluster, t.doc_id, t.n_tokens,
       |         row_number() OVER (PARTITION BY l.lbl
       |                            ORDER BY t.n_tokens DESC, t.doc_id DESC) AS rn
       |  FROM lab l JOIN tokc t ON t.doc_id = l.id)
       |SELECT cluster, doc_id, n_tokens FROM rk WHERE rn = 1
       |ORDER BY cluster""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val distinctDocs = Dedup.exactSurvivors(docs).persist()
    val labeled = Dedup.clusters(distinctDocs)
    val tokc = distinctDocs.select(col("doc_id"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
    labeled.join(tokc, "doc_id")
      .groupBy("cluster")
      .agg(max(struct(col("n_tokens"), col("doc_id"))).as("m"))
      .select(col("cluster"), col("m.doc_id").as("doc_id"),
        col("m.n_tokens").as("n_tokens"))
      .orderBy("cluster")
  }

  /** AUTO-CALIBRATED admission — "keep the top 10 % by classifier score"
    * with the threshold derived from the corpus itself, the way a
    * model-scored filter is actually operated (a fixed threshold drifts
    * as the corpus mix changes; a percentile doesn't). The threshold is
    * the EXACT order statistic at rank ⌈0.9·n⌉ of (score, doc_id) —
    * computed by [[Cumulative.rowNumber]]'s two-pass distributed rank +
    * one bounded driver read of the single rank-k row, never a global
    * sort to one partition and never an approximate percentile (approx
    * would hash-diverge across engines). Scoring is q83's exact
    * vocab-rank + affine-bucket pipeline, paid twice (rank pass +
    * admission agg) instead of caching — at 100 TB recomputing a
    * broadcast-join projection is cheaper than pinning the scored corpus.
    * Output: per-language doc/admitted counts with the threshold pinned
    * as a column.
    */
  val q105 = Q("q105_percentile_gate",
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
       |  SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_c
       |  FROM feat JOIN wts USING (bucket) GROUP BY 1),
       |scored AS (
       |  SELECT d.doc_id, d.lang, coalesce(sc.score_c, 0) AS score_c
       |  FROM documents d LEFT JOIN sc USING (doc_id)),
       |rk AS (
       |  SELECT score_c, row_number() OVER (ORDER BY score_c, doc_id) AS rk
       |  FROM scored),
       |t AS (
       |  SELECT score_c AS thr FROM rk
       |  WHERE rk = (SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) FROM scored))
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN score_c >= (SELECT thr FROM t) THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |       (SELECT thr FROM t) AS thr
       |FROM scored GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val scored = TierEleven.classifierScores(s, dir)
      .join(Tables.load(s, dir, "documents").select("doc_id", "lang"), "doc_id")
    val n = scored.count()
    val k = math.ceil(0.9 * n).toLong
    // the rank-k row: one bounded driver read (the IvfStore centroid-read
    // convention — a scalar plan parameter, not data movement)
    val thr = Cumulative.rowNumber(s, scored.select("score_c", "doc_id"),
        Seq(col("score_c"), col("doc_id")), "rk")
      .filter(col("rk") === k).select("score_c").head.getLong(0)
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_c") >= thr, 1L).otherwise(0L)).as("n_admitted"))
      .withColumn("thr", lit(thr))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(q101, q102, q103, q104, q105)
}
