package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 52 (round 11): cluster trust and weighted selection — one audit
  * of the dedup detector's own output, one published sampling scheme.
  *
  *  - q188: CLUSTER COHESION — per real near-dup cluster (components of
  *    the thr-0.95 celled embed graph): size, in-cluster pair count,
  *    and the WEAKEST LINK (minimum pair cosine). Transitive chaining
  *    (A≈B≈C with A̸≈C) shows up as a low weakest link on a large
  *    cluster — the "should I trust one-survivor-per-cluster here"
  *    audit a curator runs before committing the q58/q165 keep rule.
  *  - q189: PRIORITY SAMPLING (Duffield, Lund & Thorup, JACM 2007) —
  *    weight-proportional top-k selection with deterministic
  *    priorities: pr = ⌊w·P / u⌋ with u = 1 + the portable affine hash
  *    of doc_id (the q75/q186 uniform stand-in), w = whitespace token
  *    count, top-[[SampleK]] by (pr DESC, doc_id ASC — ties pinned,
  *    load-bearing on this fixture). Longer documents are
  *    proportionally more likely to make the sample (spec: sample mean
  *    w ≈ 69 vs corpus ≈ 56) while any fixed doc's inclusion is
  *    reproducible run to run — the corpus-subsampling shape that
  *    supports UNBIASED weighted estimates from the kept set.
  *
  * Scale: q188 = pair source + `Components` + one keyed rollup; q189 is
  * a scan + one TakeOrdered — no shuffle beyond the top-k.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star curation ops.
  */
object TierFiftyTwo {

  import TierFour.{A0, B0, P}

  private val Thr = 0.95
  private val SampleK = 100

  val q188 = Q("q188_cluster_cohesion",
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
       |sz AS (SELECT lbl AS cluster, CAST(count(*) AS BIGINT) AS csize
       |       FROM lab GROUP BY 1)
       |SELECT l.lbl AS cluster, sz.csize,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(min(h.c), 6) AS min_cos
       |FROM hits h JOIN lab l ON l.id = h.doc_a
       |JOIN sz ON sz.cluster = l.lbl
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    clusterCohesionOver(p => TierNineteen.celledEmbedPairsOf(
      docs.select("doc_id", "text"), Thr, pins = p))
  }

  /** q188's per-cluster cohesion fold over an ARBITRARY pair source
    * `(doc_a, doc_b, c)` — the extracted face the shared-build bench
    * sweep drives with [[TierNineteen.CelledArtifacts.pairs]](Thr);
    * `pairSrc` receives the face's own [[Pins]] (BenchFacesSpec pins
    * face ≡ declared query). */
  private[graft] def clusterCohesionOver(
      pairSrc: Option[Pins] => DataFrame): DataFrame = {
    val pins = new Pins
    val pairs = pins(pairSrc(Some(pins)))
    val nodes = pairs.select(col("doc_a").as("id"))
      .union(pairs.select(col("doc_b").as("id"))).distinct()
    val lab = Components.connected(nodes,
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val sz = lab.groupBy(col("lbl").as("cluster")).agg(count(lit(1)).as("csize"))
    val out = pairs
      .join(lab.select(col("id").as("doc_a"), col("lbl").as("cluster")), "doc_a")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_pairs"), round(min("c"), 6).as("min_cos"))
      .join(sz, "cluster")
      .select(col("cluster"), col("csize"), col("n_pairs"), col("min_cos"))
      .orderBy("cluster")
    Release.onFirstExecution(out, () => pins.release())
  }

  private[graft] def q188Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): DataFrame =
    clusterCohesionOver(_ => art.pairs(Thr))

  val q189 = Q("q189_priority_sample",
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |           AS w
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, w,
       |         (w * $P) // (1 + ((doc_id % $P) * $A0 + $B0) % $P) AS pr
       |  FROM t WHERE w > 0)
       |SELECT doc_id, w, pr FROM p
       |ORDER BY pr DESC, doc_id LIMIT $SampleK""".stripMargin) { (s, dir) =>
    priorityOf(Tables.load(s, dir, "documents"))
      .orderBy(col("pr").desc, col("doc_id"))
      .limit(SampleK)
  }

  /** The q189 priority projection `(doc_id, w, pr)` over any
    * `(doc_id, text, …)` frame — ONE definition for the batch top-k and
    * the live [[graft.streaming.SampleMaintainer]] (the q164/s38
    * cannot-drift rule). */
  private[graft] def priorityOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("pr",
        expr(s"(w * $P) div (1 + ((doc_id % $P) * $A0 + $B0) % $P)"))

  private[graft] val sampleK: Int = SampleK

  val all: Seq[Q] = Seq(q188, q189)
}
