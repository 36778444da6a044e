package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 46 (round 10, eighteenth wave): the SELECTION CAPSTONE — three
  * engines composed into the decision a curator actually ships, plus
  * the policy-diff report that justifies it.
  *
  *  - q176: BUDGET-CONSTRAINED DEDUP-AWARE SELECTION — keep the
  *    best-quality [[q165]]-style cluster representatives, in quality
  *    order, until the token budget runs out: `Components` (cluster),
  *    q83's classifier (rank), [[Cumulative.runningSum]] (the budget
  *    prefix over (−score, doc_id) order) in ONE declared query — the
  *    "what do we actually train on" list.
  *  - q177: SELECTION POLICY DIFF — per source, how q176's
  *    quality-first keep rule disagrees with the q159 min-id rule on
  *    the SAME clusters: both / only-quality / only-minid doc counts.
  *    The migration-review table for swapping keep rules (singleton
  *    clusters agree by construction — only real clusters can differ;
  *    spec-pinned).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star pipeline ops.
  */
object TierFortySix {

  import TierFour.{A0, B0, P}

  /** Token budget: ~half the representatives' token mass (the minhash
    * graph is dense on this fixture — ~45 clusters over 500 docs, so
    * the ~45 reps hold only ≈800 ws-tokens), so the quality cut always excludes a
    * real tail — the non-degeneracy the spec pins. */
  private[graft] val Budget = 500L

  private val ccSql =
    s"""pairs AS (${TierFour.minhashSql("documents")}),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT doc_id AS id FROM documents),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |toks AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |vocab AS (
       |  SELECT token, row_number() OVER (ORDER BY token) AS tid
       |  FROM (SELECT DISTINCT token FROM toks)),
       |wts AS (
       |  SELECT b AS bucket,
       |         CAST(((b * $A0 + $B0) % $P) % 2001 - 1000 AS BIGINT) AS w
       |  FROM (SELECT unnest(range(4096)) AS b)),
       |feat AS (
       |  SELECT doc_id, ((tid % $P) * $A0 + $B0) % $P % 4096 AS bucket
       |  FROM toks JOIN vocab USING (token)),
       |sc AS (
       |  SELECT d.doc_id, CAST(coalesce(sum(w), 0) AS BIGINT) AS score_c
       |  FROM documents d
       |  LEFT JOIN feat ON feat.doc_id = d.doc_id
       |  LEFT JOIN wts ON wts.bucket = feat.bucket
       |  GROUP BY 1),
       |rep AS (
       |  SELECT cluster, id AS rep_doc FROM (
       |    SELECT l.lbl AS cluster, l.id, sc.score_c,
       |           row_number() OVER (PARTITION BY l.lbl
       |                              ORDER BY sc.score_c DESC, l.id ASC) AS rk
       |    FROM lab l JOIN sc ON sc.doc_id = l.id) WHERE rk = 1)""".stripMargin

  val q176 = Q("q176_selection",
    s"""WITH RECURSIVE
       |$ccSql,
       |cand AS (
       |  SELECT r.rep_doc AS doc_id, sc.score_c,
       |         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT)
       |           AS n_tok
       |  FROM rep r
       |  JOIN sc ON sc.doc_id = r.rep_doc
       |  JOIN documents d ON d.doc_id = r.rep_doc),
       |cum AS (
       |  SELECT doc_id, score_c, n_tok,
       |         sum(n_tok) OVER (ORDER BY score_c DESC, doc_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS cum_tok
       |  FROM cand)
       |SELECT doc_id, score_c, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
       |FROM cum WHERE cum_tok <= $Budget
       |ORDER BY cum_tok, doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val pairs = TierFour.minhashPairs(TextOps.tok(s, dir))
    val lab = Components.connected(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    selectionOver(docs, lab, TierEleven.classifierScores(s, dir), Budget)
  }

  /** q176's selection body over prebuilt artifacts — `lab(id, lbl)` and
    * `sc(doc_id, score_c)`: quality-first cluster representatives kept
    * until `budget` tokens. The declared query builds its inputs cold;
    * [[Dedup.budgetSelection]] feeds it from the build-once
    * [[Dedup.artifacts]] handle (bit-for-bit equal —
    * DedupArtifactsSpec). */
  private[graft] def selectionOver(docs: DataFrame, lab: DataFrame,
      sc: DataFrame, budget: Long): DataFrame = {
    val s = docs.sparkSession
    val rep = lab.join(sc.select(col("doc_id").as("id"), col("score_c")), "id")
      .groupBy(col("lbl"))
      .agg(max(struct(col("score_c"), (-col("id")).as("neg"), col("id"))).as("m"))
      .select(col("m.id").as("doc_id"))
    val cand = rep
      .join(sc, "doc_id")
      .join(docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tok")),
        "doc_id")
    Cumulative.runningSum(s, cand,
        Seq((-col("score_c")).as("ns"), col("doc_id")), col("n_tok"), "cum_tok")
      .filter(col("cum_tok") <= budget)
      .select(col("doc_id"), col("score_c"), col("n_tok"), col("cum_tok"))
      .orderBy("cum_tok", "doc_id")
  }

  val q177 = Q("q177_policy_diff",
    s"""WITH RECURSIVE
       |$ccSql,
       |mn AS (SELECT lbl AS cluster, min(id) AS min_doc FROM lab GROUP BY 1),
       |j AS (
       |  SELECT r.cluster, r.rep_doc, m.min_doc, d.source
       |  FROM rep r JOIN mn m ON m.cluster = r.cluster
       |  JOIN documents d ON d.doc_id = r.rep_doc)
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(sum(CASE WHEN rep_doc = min_doc THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_agree,
       |       CAST(sum(CASE WHEN rep_doc <> min_doc THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_differ
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val pins = new Pins
    val pairs = TierFour.minhashPairs(TextOps.tok(s, dir))
    val lab = pins(Components.connected(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))))
      // pinned: feeds the representative argmax AND the min-id rule
    val out = policyDiffOver(docs, lab, TierEleven.classifierScores(s, dir))
    Release.onFirstExecution(out, () => pins.release())
  }

  /** q177's policy-diff body over prebuilt artifacts — `lab(id, lbl)`
    * and `sc(doc_id, score_c)`. `lab` feeds two consumers (argmax + min
    * rule): the caller pins it ([[Dedup.artifacts]] does; the declared
    * query threads its own [[Pins]]). */
  private[graft] def policyDiffOver(docs: DataFrame, lab: DataFrame,
      sc: DataFrame): DataFrame = {
    val rep = lab.join(sc.select(col("doc_id").as("id"), col("score_c")), "id")
      .groupBy(col("lbl").as("cluster"))
      .agg(max(struct(col("score_c"), (-col("id")).as("neg"), col("id"))).as("m"))
      .select(col("cluster"), col("m.id").as("rep_doc"))
    val mn = lab.groupBy(col("lbl").as("cluster")).agg(min("id").as("min_doc"))
    rep.join(mn, "cluster")
      .join(docs.select(col("doc_id").as("rep_doc"), col("source")), "rep_doc")
      .groupBy("source")
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("rep_doc") === col("min_doc"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("rep_doc") =!= col("min_doc"), 1L).otherwise(0L)).as("n_differ"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(q176, q177)
}
