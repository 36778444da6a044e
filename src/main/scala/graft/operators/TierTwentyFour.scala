package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 24 (round 8, sixteenth wave): per-doc lexical-diversity scoring
  * and token-community mining — the distribution-shape diagnostics that
  * close out the text-analysis family.
  *
  *  - q132: LEXICAL DIVERSITY — type-token ratio and Gini impurity of the
  *    per-doc token distribution, both integer ppm: entropy's
  *    log-free sibling (q57's libm rule), the repetitive-doc signal a
  *    quality gate thresholds (low diversity = templated/spammy text;
  *    complements q49's max-token repetition with the FULL distribution).
  *  - q133: TOKEN COMMUNITIES — connected components over the top-K
  *    collocation edges (q131's association graph): the "topic-ish"
  *    vocabulary clusters association-rule mining yields, and the proof
  *    that [[Components]] is modality-agnostic (documents, embeddings,
  *    now vocabulary).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star LLM-pipeline ops.
  */
object TierTwentyFour {

  /** Community edge budget: the top-K lift pairs form the association
    * graph q133 clusters (a fixed-K graph is non-degenerate at every SF,
    * where a fixed lift threshold collapses to all-singletons or one
    * giant component as the corpus grows). */
  private[operators] val CommunityEdges = 12

  /** Per-doc lexical diversity: `ttr_ppm = types·10⁶ // tokens` and Gini
    * impurity `gini_ppm = (n² − Σc²)·10⁶ // n²` over the token counts —
    * all-integer (entropy would need ln; Gini is the standard log-free
    * impurity and ranks the same templated-vs-diverse split). A
    * one-token doc scores gini 0; an all-distinct doc scores the maximum
    * `(1 − 1/n)·10⁶`.
    *
    * Scale: one (doc, token) count shuffle + one per-doc fold —
    * partial+final throughout, bodies read once. Int64: `n²·10⁶` wraps
    * at ~3·10⁶ tokens in ONE document — far past any real doc; chunk
    * first (q63) or DECIMAL past that.
    */
  val q132 = Q("q132_lexical_diversity",
    """WITH tc AS (
      |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> '' GROUP BY 1, 2),
      |ag AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
      |         CAST(count(*) AS BIGINT) AS n_types,
      |         CAST(sum(cnt * cnt) AS BIGINT) AS s2
      |  FROM tc GROUP BY 1)
      |SELECT doc_id, n_tok, n_types,
      |       CAST(n_types * 1000000 // n_tok AS BIGINT) AS ttr_ppm,
      |       CAST((n_tok * n_tok - s2) * 1000000 // (n_tok * n_tok) AS BIGINT) AS gini_ppm
      |FROM ag ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_tok"), count(lit(1)).as("n_types"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("doc_id"), col("n_tok"), col("n_types"),
        expr("n_types * 1000000 div n_tok").as("ttr_ppm"),
        expr("(n_tok * n_tok - s2) * 1000000 div (n_tok * n_tok)").as("gini_ppm"))
      .orderBy("doc_id")
  }

  /** q132's metrics as ONE per-row column expression — `struct(n_tok,
    * n_types, ttr_ppm, gini_ppm)` computed from the token array with
    * array HOFs, NO shuffle at all: the stateless form that screens a
    * live STREAM (s35 pins streamed ≡ batch q132 row for row — a genuine
    * cross-implementation differential: HOF arithmetic vs the shuffle
    * aggregation). Work is O(tokens·types) per row — right for real
    * documents; a pathological mega-doc prefers q132's aggregation shape
    * (chunk first, q63). NULL for token-less text (the batch query's
    * absent-row twin). */
  def diversity(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = filter(split(text, " "), x => x =!= "")
    val counts = transform(array_distinct(toks),
      t => size(filter(toks, x => x === t)).cast("long"))
    val n = size(toks).cast("long")
    val types = size(array_distinct(toks)).cast("long")
    val s2 = aggregate(counts, lit(0L), (acc, c) => acc + c * c)
    // exact integer division without an expr() name dependency: subtract
    // the remainder first, then the double division is exact (all values
    // < 2^53)
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    when(n > 0, struct(
      n.as("n_tok"), types.as("n_types"),
      idiv(types * 1000000L, n).as("ttr_ppm"),
      idiv((n * n - s2) * 1000000L, n * n).as("gini_ppm")))
  }

  /** Token communities — connected components over the top-K collocation
    * edges (q131's lift graph, K = [[CommunityEdges]], the same pinned
    * (lift DESC, ta, tb) order): each community labeled by its
    * alphabetically-least member, members listed sorted. Singleton
    * communities are tokens whose strongest association fell outside the
    * top-K — they stay their own row (the long tail a topic model drops;
    * kept here so Σ n_tokens covers the graph's node set exactly).
    *
    * Scale: the association graph is vocabulary-sized (top-K edges, ≤ 2K
    * nodes), so the clustering itself is metadata-scale — the corpus-side
    * cost is entirely q131's pair aggregation. [[Components]]' contracting
    * label propagation runs unchanged on token ids (vocab ranks), proving
    * the cluster engine is keyed-by-anything; labels map back through the
    * same vocab table, so "min tid" IS "min token" (rank order = sort
    * order).
    */
  val q133 = Q("q133_token_communities",
    s"""WITH RECURSIVE ${TierTwentyThree.liftSql},
       |top AS (SELECT ta, tb FROM lift
       |        ORDER BY lift_ppm DESC, ta, tb LIMIT $CommunityEdges),
       |tnode AS (SELECT DISTINCT t FROM
       |          (SELECT ta AS t FROM top UNION ALL SELECT tb FROM top)),
       |ted AS (SELECT ta AS u, tb AS v FROM top
       |        UNION SELECT tb, ta FROM top),
       |reach(t, lbl) AS (
       |  SELECT t, t FROM tnode
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN ted e ON e.u = r.t WHERE r.lbl < e.v),
       |lab AS (SELECT t, min(lbl) AS lbl FROM reach GROUP BY t)
       |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_tokens,
       |       array_to_string(list(t ORDER BY t), ',') AS members
       |FROM lab GROUP BY lbl ORDER BY community""".stripMargin) { (s, dir) =>
    val top = TierTwentyThree.collocationLift(s, dir)
      .orderBy(col("lift_ppm").desc, col("ta"), col("tb"))
      .limit(CommunityEdges)
      .select("ta", "tb").persist() // node set + both edge endpoints fold it
    val toks = top.select(col("ta").as("token"))
      .union(top.select(col("tb").as("token"))).distinct()
    val vocab = Cumulative.rowNumber(s, toks, Seq(col("token")), "tid")
      .persist() // edge mapping + node set + label re-mapping
    val e = top
      .join(vocab.select(col("token").as("ta"), col("tid").as("src")), "ta")
      .join(vocab.select(col("token").as("tb"), col("tid").as("dst")), "tb")
      .select("src", "dst")
    val lbl = Components.connected(vocab.select(col("tid").as("id")), e)
    lbl.join(vocab.select(col("tid").as("id"), col("token")), "id")
      .join(vocab.select(col("tid").as("lbl"), col("token").as("community")), "lbl")
      .groupBy("community")
      .agg(count(lit(1)).as("n_tokens"),
        array_join(array_sort(collect_list(col("token"))), ",").as("members"))
      .orderBy("community")
  }

  val all: Seq[Q] = Seq(q132, q133)
}
