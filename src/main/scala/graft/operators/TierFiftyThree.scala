package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 53 (round 11, second wave): concentration diagnostics — where
  * does the duplicate mass sit, and how bursty is the ingest?
  *
  *  - q190: DUPLICATION CONCENTRATION — one-row Herfindahl report over
  *    the REAL near-dup clusters' token mass (components of the
  *    thr-0.95 celled embed graph, size ≥ 2): cluster count, duplicated
  *    docs/tokens, HHI in ppm (Σ share² — 1e6 = one family owns all
  *    duplication, 1e6/k = spread evenly), and the top family's share.
  *    Tells a curator whether dedup wins come from a few huge template
  *    families (kill the source) or a long tail (keep the detector).
  *  - q191: INGEST BURSTINESS — per event type, the Fano factor
  *    (variance-to-mean of daily counts) in exact-integer ppm:
  *    `(n·SS − S²)·10⁶ / (n·S)` (q149's scalars, re-used for
  *    dispersion instead of outliers). Fano ≈ 1e6 is Poisson-like
  *    arrival; above = bursty/clumped, below = regular/throttled —
  *    the pipeline-health profile behind q149's per-day tripwire.
  *    Both flag states live on the fixture (spec-pinned).
  *
  * Scale: q190 = the celled pair source + `Components` + two
  * partial+final rollups (one per-cluster, one 1-row fold); q191 is
  * q149's (type, day) grid + one per-type 3-scalar fold. Int64
  * envelope for q191: n·SS ≈ days²·cnt² — the q149 envelope; same
  * DECIMAL escape documented there.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star curation ops.
  */
object TierFiftyThree {

  private val Thr = 0.95

  val q190 = Q("q190_dup_concentration",
    s"""WITH RECURSIVE
       |${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(Thr)},
       |nodes AS (
       |  SELECT DISTINCT doc_a AS id FROM hits
       |  UNION SELECT doc_b FROM hits),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM hits
       |  UNION SELECT doc_b, doc_a FROM hits),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |cm AS (
       |  SELECT l.lbl,
       |         CAST(count(*) AS BIGINT) AS nd,
       |         CAST(sum(len(list_filter(string_split(d.text, ' '), x -> x <> '')))
       |           AS BIGINT) AS nt
       |  FROM lab l JOIN documents d ON d.doc_id = l.id GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(sum(nd) AS BIGINT) AS dup_docs,
       |       CAST(sum(nt) AS BIGINT) AS dup_tokens,
       |       CAST(sum(nt * nt * 1000000) // (sum(nt) * sum(nt)) AS BIGINT) AS hhi_ppm,
       |       CAST(max(nt) * 1000000 // sum(nt) AS BIGINT) AS top_share_ppm
       |FROM cm""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    dupConcentrationOver(docs, p => TierNineteen.celledEmbedPairsOf(
      docs.select("doc_id", "text"), Thr, pins = p))
  }

  /** q190's concentration fold over an ARBITRARY pair source — the
    * extracted face the shared-build bench sweep drives with
    * [[TierNineteen.CelledArtifacts.pairs]](Thr); `pairSrc` receives the
    * face's own [[Pins]] (BenchFacesSpec pins face ≡ declared query). */
  private[graft] def dupConcentrationOver(docs: DataFrame,
      pairSrc: Option[Pins] => DataFrame): DataFrame = {
    val pins = new Pins
    val pairs = pins(pairSrc(Some(pins))
      .select("doc_a", "doc_b"))
    val nodes = pairs.select(col("doc_a").as("id"))
      .union(pairs.select(col("doc_b").as("id"))).distinct()
    val lab = Components.connected(nodes,
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val cm = lab
      .join(docs.select(col("doc_id").as("id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("nt")), "id")
      .groupBy("lbl")
      .agg(count(lit(1)).as("nd"), sum("nt").as("nt"))
    val out = cm.agg(count(lit(1)).as("n_clusters"), sum("nd").as("dup_docs"),
        sum("nt").as("dup_tokens"),
        sum(col("nt") * col("nt") * 1000000L).as("sq"), max("nt").as("mx"))
      .select(col("n_clusters"), col("dup_docs"), col("dup_tokens"),
        expr("sq div (dup_tokens * dup_tokens)").as("hhi_ppm"),
        expr("(mx * 1000000) div dup_tokens").as("top_share_ppm"))
    Release.onFirstExecution(out, () => pins.release())
  }

  private[graft] def q190Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    dupConcentrationOver(Tables.load(s, dir, "documents"), _ => art.pairs(Thr))

  val q191 = Q("q191_dispersion",
    """WITH dc AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(c) AS BIGINT) AS n_events,
      |       CAST((count(*) * sum(c * c) - sum(c) * sum(c)) * 1000000
      |            // (count(*) * sum(c)) AS BIGINT) AS fano_ppm,
      |       CAST(CASE WHEN (count(*) * sum(c * c) - sum(c) * sum(c)) * 1000000
      |                      > 1000000 * (count(*) * sum(c))
      |                 THEN 1 ELSE 0 END AS BIGINT) AS bursty
      |FROM dc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    TierThirtyTwo.dailyCounts(Tables.load(s, dir, "events"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("n_events"),
        sum(col("cnt") * col("cnt")).as("ss"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        expr("((n_days * ss - n_events * n_events) * 1000000)"
          + " div (n_days * n_events)").as("fano_ppm"),
        when((col("n_days") * col("ss") - col("n_events") * col("n_events")) * 1000000L
            > lit(1000000L) * (col("n_days") * col("n_events")), 1L)
          .otherwise(0L).as("bursty"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q190, q191)
}
