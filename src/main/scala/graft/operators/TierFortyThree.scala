package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 43 (round 10, fifteenth wave): corpus-growth diagnostics — is
  * new data actually NEW, and where does the near-dup mass sit?
  *
  *  - q170: NOVELTY DECAY — per document (in doc_id = ingest order),
  *    the ppm fraction of its distinct 8-token shingles appearing in NO
  *    earlier document: the marginal-information curve of a growing
  *    corpus ("the 400th crawl batch is 60 % re-hash"). First
  *    occurrence = the shingle's min doc_id (one key-keyed min), so the
  *    whole curve costs one shingle aggregation + one join — the q101
  *    economics.
  *  - q171: SIMILARITY HISTOGRAM — near-dup pair counts bucketed by
  *    cosine in 0.05 bands from 0.80 up (bucket = ⌊c·20⌋, exact — both
  *    engines floor the same IEEE double): the threshold-sensitivity
  *    report that tells a curator WHERE to cut before committing a
  *    dedup threshold (q121's 0.9 is a band edge here, visible as the
  *    mass above vs below).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star curation ops.
  */
object TierFortyThree {

  private val W = 8
  private val HistThr = 0.8

  val q170 = Q("q170_novelty_decay",
    s"""WITH l AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, key FROM (
       |    SELECT doc_id,
       |           unnest([array_to_string(l[i:i+${W - 1}], ' ')
       |                   for i in range(1, len(l) - ${W - 2})]) AS key
       |    FROM l WHERE len(l) >= $W)),
       |fo AS (SELECT key, min(doc_id) AS owner FROM g GROUP BY 1)
       |SELECT g.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_shingles,
       |       CAST(sum(CASE WHEN fo.owner = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_novel,
       |       CAST((sum(CASE WHEN fo.owner = g.doc_id THEN 1 ELSE 0 END) * 1000000)
       |         // count(*) AS BIGINT) AS novel_ppm
       |FROM g JOIN fo ON fo.key = g.key
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val pins = new Pins
    val g = pins(Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) >= W)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("l")) - (W - 1)),
          i => concat_ws(" ", slice(col("l"), i, lit(W))))).as("key"))
      .distinct())
      // pinned: feeds the first-occurrence min AND the per-doc fold
    val fo = g.groupBy("key").agg(min("doc_id").as("owner"))
    val out = g.join(fo, "key")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 1000000) div n_shingles").as("novel_ppm"))
      .orderBy("doc_id")
    Release.onFirstExecution(out, () => pins.release())
  }

  val q171 = Q("q171_sim_histogram",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(HistThr)}
       |SELECT CAST(floor(c * 20) AS BIGINT) AS bucket,
       |       CAST(floor(c * 20) * 50000 AS BIGINT) AS lo_ppm,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM hits GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    simHistogramOver(TierNineteen.celledEmbedPairsOf(docs.select("doc_id", "text"), HistThr))
  }

  /** q171's bucket fold over an ARBITRARY pair frame `(…, c)` — the
    * extracted face the shared-build bench sweep drives with
    * [[TierNineteen.CelledArtifacts.pairs]](HistThr) (BenchFacesSpec
    * pins face ≡ declared query). */
  private[graft] def simHistogramOver(hits: DataFrame): DataFrame =
    hits
      .select(floor(col("c") * 20).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("bucket"), (col("bucket") * 50000).as("lo_ppm"), col("n_pairs"))
      .orderBy("bucket")

  private[graft] def q171Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    simHistogramOver(art.pairs(HistThr))

  val all: Seq[Q] = Seq(q170, q171)
}
