package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 54 (round 11, third wave): bounded-state vocabulary analytics —
  * what dominates the token stream, and how far apart do the sources'
  * vocabularies sit?
  *
  *  - q192: EXACT HEAVY HITTERS, TWO-PHASE — tokens with true frequency
  *    > N/64, computed without ever shuffling the token stream or the
  *    vocabulary: phase 1 is a per-partition Misra–Gries 64-counter
  *    sketch ([[graft.functions.MisraGries]] — union of survivors is a
  *    guaranteed heavy-hitter superset by pigeonhole, ≤ 64 rows per
  *    partition); phase 2 recounts ONLY the candidates through a
  *    broadcast semi-join (map-side partials collapse each partition to
  *    ≤ |candidates| rows before the one tiny shuffle) and keeps the
  *    survivors of the exact cnt·64 > N test. Output is exact and
  *    deterministic — the sketch only ever affects WORK, not the answer.
  *    The all-groupBy alternative shuffles the full vocabulary; at a
  *    100 TB corpus that is the difference between a bounded candidate
  *    recount and a vocabulary-scale exchange.
  *  - q193: LEXICAL SOURCE DRIFT — the source×source total-variation
  *    distance matrix over token distributions, exact-integer ppm:
  *    TV(a,b) = ½ Σ_t |p_a(t) − p_b(t)| with p floored to ppm. The
  *    missing-token mass is folded in WITHOUT a full-outer join via
  *    Σ|p_a−p_b| = Σ_∩|p_a−p_b| + (S_a − Σ_∩p_a) + (S_b − Σ_∩p_b):
  *    one token-keyed INNER self-join (per-token fan bounded by
  *    sources², sources are bounded metadata) plus the 20-row per-source
  *    ppm sums. The lexical complement of q162's embedding-space drift
  *    matrix — catches vocabulary shift that survives the 8-dim hash
  *    embedding. Int64: c·10⁶ caps the per-(source,token) count at
  *    ~9·10¹² — fine at 100 TB; Σ|Δppm| ≤ 2·10⁶ by construction.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star curation ops.
  */
object TierFiftyFour {

  /** Heavy-hitter threshold denominator: report tokens with cnt·K > N. */
  private[graft] val K = 64

  val q192 = Q("q192_heavy_hitters",
    s"""WITH tk0 AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |tks AS (SELECT token FROM tk0 WHERE token <> ''),
       |ntot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tks)
       |SELECT t.token,
       |       CAST(count(*) AS BIGINT) AS cnt,
       |       CAST(count(*) * 1000000 // ntot.n AS BIGINT) AS share_ppm
       |FROM tks t, ntot
       |GROUP BY t.token, ntot.n
       |HAVING count(*) * $K > ntot.n
       |ORDER BY cnt DESC, token""".stripMargin) { (s, dir) =>
    val toks = Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val cands = graft.functions.MisraGries.candidates(toks, K)
    val tot = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * K > col("n"))
      .select(col("token"), col("cnt"),
        expr("cnt * 1000000 div n").as("share_ppm"))
      .orderBy(desc("cnt"), col("token"))
  }

  val q193 = Q("q193_lexical_drift",
    """WITH tk0 AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
      |stc AS (
      |  SELECT source, token, CAST(count(*) AS BIGINT) AS c
      |  FROM tk0 WHERE token <> '' GROUP BY 1, 2),
      |stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM stc GROUP BY 1),
      |pp AS (
      |  SELECT s.source, s.token, CAST(s.c * 1000000 // t.n AS BIGINT) AS ppm
      |  FROM stc s JOIN stot t USING (source)),
      |sps AS (SELECT source, CAST(sum(ppm) AS BIGINT) AS sp FROM pp GROUP BY 1),
      |ij AS (
      |  SELECT a.source AS sa, b.source AS sb,
      |         CAST(sum(abs(a.ppm - b.ppm)) AS BIGINT) AS dab,
      |         CAST(sum(a.ppm) AS BIGINT) AS ia,
      |         CAST(sum(b.ppm) AS BIGINT) AS ib,
      |         CAST(count(*) AS BIGINT) AS shared
      |  FROM pp a JOIN pp b ON b.token = a.token AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT x.source AS src_a, y.source AS src_b,
      |       CAST((coalesce(ij.dab, 0) + x.sp - coalesce(ij.ia, 0)
      |             + y.sp - coalesce(ij.ib, 0)) // 2 AS BIGINT) AS tv_ppm,
      |       CAST(coalesce(ij.shared, 0) AS BIGINT) AS shared_tokens
      |FROM sps x JOIN sps y ON x.source < y.source
      |LEFT JOIN ij ON ij.sa = x.source AND ij.sb = y.source
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val stc = Tables.load(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val stot = stc.groupBy("source").agg(sum("c").as("n"))
    val pp = pins(stc.join(stot, "source")
      .select(col("source"), col("token"), expr("c * 1000000 div n").as("ppm")))
    val sps = pins(pp.groupBy("source").agg(sum("ppm").as("sp")))
    val ij = pp.select(col("source").as("sa"), col("token"), col("ppm").as("pa"))
      .join(pp.select(col("source").as("sb"), col("token"), col("ppm").as("pb")),
        Seq("token"))
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(sum(abs(col("pa") - col("pb"))).as("dab"),
        sum("pa").as("ia"), sum("pb").as("ib"), count(lit(1)).as("shared"))
    val out = broadcast(sps.select(col("source").as("src_a"), col("sp").as("spa")))
      .join(broadcast(sps.select(col("source").as("src_b"), col("sp").as("spb"))),
        col("src_a") < col("src_b"))
      .join(ij, col("sa") === col("src_a") && col("sb") === col("src_b"), "left")
      .select(col("src_a"), col("src_b"),
        expr("(coalesce(dab, 0L) + spa - coalesce(ia, 0L)"
          + " + spb - coalesce(ib, 0L)) div 2").as("tv_ppm"),
        coalesce(col("shared"), lit(0L)).as("shared_tokens"))
      .orderBy("src_a", "src_b")
    Release.onFirstExecution(out, () => pins.release())
  }

  val all: Seq[Q] = Seq(q192, q193)
}
