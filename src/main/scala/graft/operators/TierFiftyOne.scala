package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 51 (round 11): split hygiene and corpus diversity — the two
  * reports that decide whether an eval number can be trusted.
  *
  *  - q186: LEAKAGE-FREE CLUSTER SPLIT — q122 MEASURES semantic
  *    train/valid leakage; this PREVENTS it: assign whole near-dup
  *    CLUSTERS (components of the thr-0.95 celled embed graph, the
  *    q121/q143 production pair source) to train/valid/test by the
  *    portable affine hash of the CLUSTER label — a doc can never
  *    straddle a split from its semantic twin, so cross-split pair
  *    count is ZERO by construction (the grouped-split rule every
  *    dedup-aware eval protocol uses; spec-pinned). 800/900 buckets →
  *    ~80/10/10, singletons split as their own clusters.
  *  - q187: N-GRAM DIVERSITY — corpus distinct-n-gram ratio for
  *    n = 1, 2, 3 (the self-repetition / memorization-pressure profile:
  *    a corpus whose 3-gram ratio collapses is recitation, not
  *    coverage). All-integer ppm output; n-gram generation is q170's
  *    shingle expansion at widths 1–3.
  *
  * Scale: q186 is the celled pair source + `Components` + one
  * partial+final rollup — nothing all-pairs; q187 is three shingle
  * expansions, each one groupBy-free `count + count(DISTINCT)` pass
  * (Spark plans the distinct as a two-stage partial aggregate).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star pipeline ops.
  */
object TierFiftyOne {

  import TierFour.{A0, B0, P}

  private val Thr = 0.95
  private val T1 = 800
  private val T2 = 900

  val q186 = Q("q186_cluster_split",
    s"""WITH RECURSIVE
       |${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(Thr)},
       |nodes AS (SELECT doc_id AS id FROM documents),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM hits
       |  UNION
       |  SELECT doc_b, doc_a FROM hits),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |st AS (
       |  SELECT l.id, l.lbl,
       |         CASE WHEN ((l.lbl % $P) * $A0 + $B0) % $P % 1000 < $T1 THEN 'train'
       |              WHEN ((l.lbl % $P) * $A0 + $B0) % $P % 1000 < $T2 THEN 'valid'
       |              ELSE 'test' END AS split,
       |         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT)
       |           AS nt
       |  FROM lab l JOIN documents d ON d.doc_id = l.id)
       |SELECT split, CAST(count(DISTINCT lbl) AS BIGINT) AS n_clusters,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(nt) AS BIGINT) AS n_tokens
       |FROM st GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    clusterSplitOver(docs, p => TierNineteen.celledEmbedPairsOf(
      docs.select("doc_id", "text"), Thr, pins = p))
  }

  /** q186's component-split fold over an ARBITRARY pair source — the
    * extracted face the shared-build bench sweep drives with
    * [[TierNineteen.CelledArtifacts.pairs]](Thr); `pairSrc` receives the
    * face's own [[Pins]] (BenchFacesSpec pins face ≡ declared query). */
  private[graft] def clusterSplitOver(docs: DataFrame,
      pairSrc: Option[Pins] => DataFrame): DataFrame = {
    val pins = new Pins
    val pairs = pins(pairSrc(Some(pins))
      .select("doc_a", "doc_b"))
    val lab = Components.connected(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val bkt = ((col("lbl") % P) * A0 + B0) % P % 1000
    val out = lab
      .join(docs.select(col("doc_id").as("id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("nt")), "id")
      .select(col("lbl"),
        when(bkt < T1, "train").when(bkt < T2, "valid").otherwise("test").as("split"),
        col("nt"))
      .groupBy("split")
      .agg(countDistinct("lbl").as("n_clusters"), count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"))
      .orderBy("split")
    Release.onFirstExecution(out, () => pins.release())
  }

  private[graft] def q186Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    clusterSplitOver(Tables.load(s, dir, "documents"), _ => art.pairs(Thr))

  /** One width's shingle stream (q170's expansion) folded to the
    * diversity row — total, distinct, distinct-ppm. */
  private def gramsOf(docs: DataFrame, n: Int): DataFrame =
    docs.select(filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) >= n)
      .select(explode(transform(sequence(lit(1), size(col("l")) - (n - 1)),
        i => concat_ws(" ", slice(col("l"), i, lit(n))))).as("key"))
      .agg(count(lit(1)).as("total"), countDistinct("key").as("n_distinct"))
      .select(lit(n.toLong).as("n"), col("total"), col("n_distinct"),
        expr("(n_distinct * 1000000) div total").as("distinct_ppm"))

  private def gramSql(n: Int): String = {
    val hi = if (n > 1) s"i+${n - 1}" else "i"
    s"""g$n AS (
       |  SELECT unnest([array_to_string(l[i:$hi], ' ')
       |                 for i in range(1, len(l) - ${n - 2})]) AS key
       |  FROM ll WHERE len(l) >= $n),
       |a$n AS (
       |  SELECT CAST($n AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS total,
       |         CAST(count(DISTINCT key) AS BIGINT) AS n_distinct
       |  FROM g$n)""".stripMargin
  }

  val q187 = Q("q187_ngram_diversity",
    s"""WITH ll AS (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l
       |  FROM documents),
       |${(1 to 3).map(gramSql).mkString(",\n")}
       |SELECT n, total, n_distinct,
       |       (n_distinct * 1000000) // total AS distinct_ppm
       |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
       |ORDER BY n""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    (1 to 3).map(gramsOf(docs, _)).reduce(_.unionAll(_)).orderBy("n")
  }

  val all: Seq[Q] = Seq(q186, q187)
}
