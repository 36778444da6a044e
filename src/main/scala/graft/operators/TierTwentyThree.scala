package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 23 (round 8, thirteenth wave): graph-shape and co-occurrence
  * diagnostics — what the dup graph LOOKS like, and which token pairs
  * travel together.
  *
  *  - q130: dup-graph TRIANGLE stats — per-node triangle count and local
  *    clustering coefficient over the semantic near-dup graph: clique-ish
  *    neighborhoods (high LCC) mean template families that collapse
  *    cleanly under cluster dedup; star-ish ones (high degree, zero LCC)
  *    mean hub boilerplate — exactly the structural split
  *    [[Components]]' stall heuristic and q104's priority policy care
  *    about.
  *  - q131: COLLOCATION mining — document-level token co-occurrence lift
  *    (the PMI ratio in integer ppm): the association-rule shape
  *    (phrase/entity discovery) that q57's adjacent-bigram LM cannot see.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star LLM-pipeline ops.
  */
object TierTwentyThree {

  private val Thr = 0.9
  /** Collocation support floor: a pair must co-occur in ≥ MinPairDocs
    * docs before its lift is ranked (rare-pair lifts are noise). */
  private val MinPairDocs = 5

  /** Per-node triangle count + local clustering coefficient in ppm over
    * the near-dup graph (cos ≥ 0.9) — since round 12 the DECLARED edge
    * source is the celled production pair path
    * ([[TierNineteen.celledEmbedPairsOf]], oracle mirrored CTE-by-CTE by
    * [[TierNineteen.celledPairSql]]); both pinned frames ride one [[Pins]]
    * released on first execution. Triangle enumeration is the
    * classic FORWARD algorithm on the ordered edge list (doc_a < doc_b —
    * free, q121 emits pairs ordered): wedges (a<b<c) from one self-join
    * on the shared middle vertex, closed by one join back to the edge
    * set — each triangle found exactly once, O(m^{3/2}) candidate work.
    * `lcc_ppm = 2·tri·10⁶ // deg·(deg−1)` — all-integer (q57's rule).
    *
    * Scale: two edge-keyed shuffle joins + two fold aggregates; nothing
    * touches document bodies. Hub vertices skew the wedge join — the
    * ordered orientation already caps a hub's wedge fan-out to its
    * HIGHER-id neighbors, and AQE's skew split covers the rest (the
    * production refinement is degree-ordering instead of id-ordering;
    * same plan shape).
    */
  val q130 = Q("q130_dup_graph_stats",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(Thr)},
       |tri AS (
       |  SELECT h1.doc_a AS a, h1.doc_b AS b, h2.doc_b AS c
       |  FROM hits h1 JOIN hits h2 ON h2.doc_a = h1.doc_b
       |  JOIN hits h3 ON h3.doc_a = h1.doc_a AND h3.doc_b = h2.doc_b),
       |trn AS (SELECT a AS nid FROM tri UNION ALL SELECT b FROM tri
       |       UNION ALL SELECT c FROM tri),
       |trc AS (SELECT nid, CAST(count(*) AS BIGINT) AS n_tri FROM trn GROUP BY 1),
       |dgr AS (SELECT nid, CAST(count(*) AS BIGINT) AS deg FROM
       |       (SELECT doc_a AS nid FROM hits UNION ALL SELECT doc_b AS nid FROM hits)
       |       GROUP BY 1)
       |SELECT dgr.nid AS doc_id, dgr.deg, coalesce(trc.n_tri, 0) AS n_tri,
       |       CAST(CASE WHEN dgr.deg >= 2
       |            THEN 2 * coalesce(trc.n_tri, 0) * 1000000 // (dgr.deg * (dgr.deg - 1))
       |            ELSE 0 END AS BIGINT) AS lcc_ppm
       |FROM dgr LEFT JOIN trc USING (nid) ORDER BY doc_id""".stripMargin) { (s, dir) =>
    dupGraphStatsOver(p => TierNineteen.celledEmbedPairsOf(
      Tables.load(s, dir, "documents").select("doc_id", "text"), Thr, pins = p))
  }

  /** q130's triangle/degree report over an ARBITRARY pair source — the
    * extracted face the shared-build bench sweep drives with
    * [[TierNineteen.CelledArtifacts.pairs]](Thr); `pairSrc` receives the
    * face's own [[Pins]] so a self-training source threads its internals
    * through the same release (BenchFacesSpec pins face ≡ declared query
    * bit for bit). */
  private[graft] def dupGraphStatsOver(
      pairSrc: Option[Pins] => DataFrame): DataFrame = {
    val pins = new Pins
    val hits = pins(pairSrc(Some(pins))
      .select(col("doc_a"), col("doc_b")))
    val tri = pins(hits.as("h1")
      .join(hits.as("h2"), col("h1.doc_b") === col("h2.doc_a"))
      .select(col("h1.doc_a").as("a"), col("h1.doc_b").as("b"), col("h2.doc_b").as("c"))
      .join(hits.as("h3"),
        col("a") === col("h3.doc_a") && col("c") === col("h3.doc_b"))
      .select("a", "b", "c")) // three per-corner scans fold it
    val tc = tri.select(col("a").as("nid"))
      .union(tri.select(col("b").as("nid")))
      .union(tri.select(col("c").as("nid")))
      .groupBy("nid").agg(count(lit(1)).as("n_tri"))
    val dg = hits.select(col("doc_a").as("nid"))
      .union(hits.select(col("doc_b").as("nid")))
      .groupBy("nid").agg(count(lit(1)).as("deg"))
    Release.onFirstExecution(
      dg.join(tc, Seq("nid"), "left")
        .select(col("nid").as("doc_id"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          expr("CAST(CASE WHEN deg >= 2 THEN (2 * coalesce(n_tri, CAST(0 AS BIGINT)) * 1000000)" +
            " div (deg * (deg - 1)) ELSE CAST(0 AS BIGINT) END AS BIGINT)").as("lcc_ppm"))
        .orderBy("doc_id"),
      () => pins.release())
  }

  private[graft] def q130Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    dupGraphStatsOver(_ => art.pairs(Thr))

  /** Top-20 token COLLOCATIONS by document-level co-occurrence lift —
    * `lift_ppm = c_ab·N·10⁶ // (c_a·c_b)` over per-doc DISTINCT token
    * sets (the PMI ratio without the log, q57's integer-surrogate rule;
    * ranking-equivalent to PMI since log is monotone), support-floored at
    * [[MinPairDocs]] co-occurring docs, ties pinned (ta, tb) ascending.
    *
    * Scale: the pair generator is a per-doc self-join on the DISTINCT
    * token set — fan-out is per-doc-vocabulary², never raw length², and
    * keyed on doc_id so it never crosses documents; the frequency tables
    * are vocabulary-sized broadcasts (the q112 vocab convention); the
    * top-20 is a TakeOrdered over the pair table, never a global sort.
    * Int64 envelope: `c_ab·N·10⁶` wraps at N ≈ 3·10⁶ docs if a pair
    * spans the whole corpus — past that, route the product through
    * DECIMAL(38,0) on both engines (q57's documented escape hatch); the
    * ranking is unchanged.
    */
  /** q131's oracle CTE chain ending in `lift(ta, tb, c_ab, lift_ppm)` —
    * shared with the token-community query ([[TierTwentyFour.q133]]),
    * which clusters the same association graph. */
  private[operators] val liftSql: String =
    s"""dt AS (
       |  SELECT DISTINCT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
       |cf AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY 1),
       |pc AS (
       |  SELECT a.token AS ta, b.token AS tb, CAST(count(*) AS BIGINT) AS c_ab
       |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
       |  GROUP BY 1, 2),
       |lift AS (
       |  SELECT ta, tb, c_ab,
       |         CAST((c_ab * n * 1000000) // (ca.c * cb.c) AS BIGINT) AS lift_ppm
       |  FROM pc JOIN cf ca ON ca.token = pc.ta
       |  JOIN cf cb ON cb.token = pc.tb CROSS JOIN nn
       |  WHERE c_ab >= $MinPairDocs)""".stripMargin

  /** q131's engine-side lift table `(ta, tb, c_ab, lift_ppm)`, unordered —
    * the full association graph; q131 takes its top-20, q133 clusters its
    * top-[[TierTwentyFour.CommunityEdges]]. */
  private[operators] def collocationLift(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val dt = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").distinct().persist()
    val nn = dt.agg(count_distinct(col("doc_id")).as("n"))
    val cf = dt.groupBy("token").agg(count(lit(1)).as("c"))
    val pc = dt.as("a")
      .join(dt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("ta"), col("b.token").as("tb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= MinPairDocs)
    pc.join(broadcast(cf.select(col("token").as("ta"), col("c").as("ca"))), "ta")
      .join(broadcast(cf.select(col("token").as("tb"), col("c").as("cb"))), "tb")
      .crossJoin(broadcast(nn))
      .select(col("ta"), col("tb"), col("c_ab"),
        expr("CAST((c_ab * n * 1000000) div (ca * cb) AS BIGINT)").as("lift_ppm"))
  }

  val q131 = Q("q131_collocations",
    s"""WITH $liftSql
       |SELECT ta, tb, c_ab, lift_ppm FROM lift
       |ORDER BY lift_ppm DESC, ta, tb LIMIT 20""".stripMargin) { (s, dir) =>
    collocationLift(s, dir)
      .orderBy(col("lift_ppm").desc, col("ta"), col("tb"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(q130, q131)
}
