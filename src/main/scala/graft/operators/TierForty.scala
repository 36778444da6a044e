package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 40 (round 10, twelfth wave): arrival-order analytics and
  * quality-aware dedup — one op that TUNES the streaming layer, one
  * that upgrades the batch layer's keep rule.
  *
  *  - q164: RECORD EVENTS — the events that set a new all-time value
  *    high in arrival order (event_id, the generator's append order):
  *    an event is a record iff its integer cents STRICTLY exceed the
  *    high-water mark over every earlier event. The "running records"
  *    audit (peak transaction log, alert-on-new-max), and the q09/q138
  *    family's missing member: a totally-ordered fold whose state is a
  *    MAX, not a sum. Built on the new [[Cumulative.runningMax]] — the
  *    two-pass prefix-MAX twin of `runningSum` (max is associative;
  *    per-partition maxima become the carry-in array), run in its
  *    `exclusive` form so the record test is one codegen'd comparison;
  *    no SinglePartition window anywhere.
  *  - q165: BEST-OF-CLUSTER SELECTION — production dedup keeps the
  *    BEST document per near-dup cluster, not the smallest id: q55's
  *    components + q83's classifier score, representative = pinned
  *    `max(struct(score, −doc_id))`. Reported per real cluster
  *    (size ≥ 2) with the min-id doc it would have kept instead — the
  *    upgrade audit for the q58/q159 keep rule.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star analytics /
  * dedup ops.
  */
object TierForty {

  import TierFour.{A0, B0, P}

  val q164 = Q("q164_record_events",
    """WITH o AS (
      |  SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
      |         max(CAST(floor(value * 100) AS BIGINT))
      |           OVER (ORDER BY event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ehwm
      |  FROM events)
      |SELECT event_id, event_type, cents
      |FROM o WHERE ehwm IS NULL OR cents > ehwm
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    Cumulative.runningMax(s, ev, Seq(col("event_id")), col("cents"), "ehwm",
        exclusive = true)
      .filter(col("cents") > col("ehwm"))
      .select(col("event_id"), col("event_type"), col("cents"))
      .orderBy("event_id")
  }

  val q165 = Q("q165_best_of_cluster",
    s"""WITH RECURSIVE
       |pairs AS (${TierFour.minhashSql("documents")}),
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
       |cl AS (
       |  SELECT l.lbl AS cluster, l.id, sc.score_c
       |  FROM lab l JOIN sc ON sc.doc_id = l.id),
       |ag AS (
       |  SELECT cluster, CAST(count(*) AS BIGINT) AS csize,
       |         min(id) AS min_doc
       |  FROM cl GROUP BY 1 HAVING count(*) >= 2),
       |rep AS (
       |  SELECT cluster, id AS rep_doc, score_c FROM (
       |    SELECT cluster, id, score_c,
       |           row_number() OVER (PARTITION BY cluster
       |                              ORDER BY score_c DESC, id ASC) AS rk
       |    FROM cl) WHERE rk = 1)
       |SELECT ag.cluster, ag.csize, rep.rep_doc, rep.score_c, ag.min_doc
       |FROM ag JOIN rep ON rep.cluster = ag.cluster
       |ORDER BY ag.cluster""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val pairs = TierFour.minhashPairs(TextOps.tok(s, dir))
    val lab = Components.connected(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    bestOfClusterOver(lab, TierEleven.classifierScores(s, dir))
  }

  /** q165's report body over prebuilt artifacts — `lab(id, lbl)` cluster
    * labels and `sc(doc_id, score_c)` classifier scores: real clusters
    * (size ≥ 2) with their pinned `max(struct(score, −id))`
    * representative and the min-id doc the q58 rule would keep. The
    * declared query builds its inputs cold; [[Dedup.bestOfCluster]]
    * feeds it from the build-once [[Dedup.artifacts]] handle
    * (bit-for-bit equal — DedupArtifactsSpec). */
  private[graft] def bestOfClusterOver(lab: DataFrame, sc: DataFrame): DataFrame = {
    val cl = lab.join(sc.select(col("doc_id").as("id"), col("score_c")), "id")
    val ag = cl.groupBy(col("lbl").as("cluster"))
      .agg(count(lit(1)).as("csize"), min("id").as("min_doc"))
      .filter(col("csize") >= 2)
    val rep = cl.groupBy(col("lbl").as("cluster"))
      .agg(max(struct(col("score_c"), (-col("id")).as("neg"), col("id"))).as("m"))
      .select(col("cluster"), col("m.id").as("rep_doc"), col("m.score_c").as("score_c"))
    ag.join(rep, "cluster")
      .select(col("cluster"), col("csize"), col("rep_doc"), col("score_c"),
        col("min_doc"))
      .orderBy("cluster")
  }

  val all: Seq[Q] = Seq(q164, q165)
}
