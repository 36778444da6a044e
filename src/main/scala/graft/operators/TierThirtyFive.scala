package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 35 (round 10, seventh wave): the APPLY side of the association
  * graphs — q146 built the item-item projection; these consume it.
  *
  *  - q154: CO-PURCHASE RECOMMENDATIONS — item-item collaborative
  *    filtering (the Amazon shape, Linden et al., IEEE IC 2003): score
  *    a candidate supplier for a customer by summing the shared-customer
  *    weights from every supplier the customer already buys from,
  *    exclude what they already buy, top-3 per customer.
  *  - q155: LINK PREDICTION by common neighbors (Liben-Nowell &
  *    Kleinberg, CIKM 2003) on the near-dup graph — the top NON-edges
  *    ranked by shared neighbors: "these two docs are probably dups the
  *    detector missed" (the structural complement of q145's
  *    embedding-mutuality: no cosine anywhere, pure topology).
  *
  * Scale: the item-item weight table is catalog², KBs-to-MBs at any
  * corpus size — broadcast-side; per-customer scoring is one keyed join
  * + partial+final sum; the common-neighbor join is bounded by Σ deg²
  * of the (already banded) near-dup graph, with the existing-edge
  * exclusion an anti-join.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star graph-ML ops.
  */
object TierThirtyFive {

  private val TopRecs = 3
  private val TopLinks = 20

  /** Item-item neighborhood truncation: keep each supplier's top-M
    * co-purchase neighbors (the standard CF model cut — Linden et al.'s
    * "most similar items" table). Caps the scoring join at |cs|·M rows
    * instead of |cs|·|S| (a 30× wall-time cut at sf0.1), and keeps the
    * broadcast model |S|·M rows at any corpus size. */
  private val NeighborCap = 32

  /** Shared oracle CTEs: distinct (customer, supplier) purchases and the
    * symmetric shared-customer weight table (q146 unrestricted),
    * truncated to each supplier's [[NeighborCap]] strongest neighbors
    * (ties pinned shared DESC, s_b ASC). */
  private val csSql =
    s"""cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |wall AS (
       |  SELECT a.s AS s_a, b.s AS s_b, CAST(count(*) AS BIGINT) AS shared
       |  FROM cs a JOIN cs b ON b.c = a.c AND a.s <> b.s
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT s_a, s_b, shared FROM (
       |    SELECT s_a, s_b, shared,
       |           row_number() OVER (PARTITION BY s_a
       |                              ORDER BY shared DESC, s_b ASC) AS nrk
       |    FROM wall) WHERE nrk <= $NeighborCap)""".stripMargin

  private def csOf(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("su")).distinct()

  val q154 = Q("q154_copurchase_recs",
    s"""WITH $csSql,
       |sc AS (
       |  SELECT cs.c, w.s_b AS cand, CAST(sum(w.shared) AS BIGINT) AS score
       |  FROM cs JOIN w ON w.s_a = cs.s
       |  WHERE NOT EXISTS (SELECT 1 FROM cs o WHERE o.c = cs.c AND o.s = w.s_b)
       |  GROUP BY 1, 2)
       |SELECT c AS cust, cand AS supp, score FROM (
       |  SELECT c, cand, score,
       |         row_number() OVER (PARTITION BY c ORDER BY score DESC, cand ASC) AS rk
       |  FROM sc) WHERE rk <= $TopRecs
       |ORDER BY cust, score DESC, supp""".stripMargin) { (s, dir) =>
    // cs feeds FOUR materializations (both salted self-join legs, the
    // scoring join, the anti-join) — unpersisted, the orders⋈lineitem
    // join + distinct ran four times (8 base scans in the r15 plan
    // audit; the single heaviest bench entry at 13.2 s). Persisted like
    // q104's survivor frame; swept by Verify/Bench's per-query hygiene.
    val cs = csOf(s, dir).persist()
    // whale-customer guard: the c-keyed self-join's d² pair rows would
    // land in one task — salt it (pair set identical by construction;
    // TierThirtyFiveSpec pins both the plan and the equality). The
    // shared-count is symmetric, so only ia < ib pairs feed the
    // aggregation (half the Σd² rows) and the AGGREGATED frame —
    // pair-count-sized, not Σd²-sized — is mirrored to recover both
    // directions before the per-s_a neighbor cap.
    val wallHalf = Skew.saltedCoPairsHalf(cs, col("c"), col("su"))
      .groupBy(col("ia").as("s_a"), col("ib").as("s_b"))
      .agg(count(lit(1)).as("shared"))
      .persist() // feeds both mirror legs; swept per-query like cs
    val w = wallHalf
      .unionByName(wallHalf.select(col("s_b").as("s_a"),
        col("s_a").as("s_b"), col("shared")))
      .withColumn("nrk", row_number().over(
        Window.partitionBy("s_a").orderBy(col("shared").desc, col("s_b"))))
      .filter(col("nrk") <= NeighborCap).drop("nrk")
    // anti-join AFTER the (c, cand) aggregation: the already-buys filter
    // key IS the group key, so dropping groups post-agg ≡ dropping their
    // rows pre-agg — and the anti's shuffled+sorted side shrinks from the
    // |cs|·NeighborCap scoring stream to the aggregated (c, cand) frame
    val sc = cs.join(broadcast(w), col("su") === col("s_a"))
      .groupBy(col("c"), col("s_b").as("cand"))
      .agg(sum("shared").as("score"))
      .join(cs.select(col("c").as("oc"), col("su").as("os")),
        col("oc") === col("c") && col("os") === col("cand"), "left_anti")
    sc.withColumn("rk", row_number().over(
        Window.partitionBy("c").orderBy(col("score").desc, col("cand"))))
      .filter(col("rk") <= TopRecs)
      .select(col("c").as("cust"), col("cand").as("supp"), col("score"))
      .orderBy(col("cust"), col("score").desc, col("supp"))
  }

  /** Top non-edges of the symmetrized q121 near-dup graph by common
    * neighbors; (doc_a < doc_b, cn) in the pinned order. */
  val q155 = Q("q155_link_prediction",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.celledPairSql(0.9)},
       |ed AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM hits
       |  UNION ALL SELECT doc_b, doc_a FROM hits),
       |cn AS (
       |  SELECT x.src AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS cn
       |  FROM ed x JOIN ed y ON y.src = x.dst AND x.src < y.dst
       |  WHERE NOT EXISTS (SELECT 1 FROM ed e WHERE e.src = x.src AND e.dst = y.dst)
       |  GROUP BY 1, 2)
       |SELECT a AS doc_a, b AS doc_b, cn FROM cn
       |ORDER BY cn DESC, doc_a, doc_b LIMIT $TopLinks""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    linkPredictionOver(p => TierNineteen.celledEmbedPairsOf(
      docs.select("doc_id", "text"), 0.9, pins = p))
  }

  /** q155's common-neighbor scorer over an ARBITRARY pair source — the
    * extracted face the shared-build bench sweep drives with
    * [[TierNineteen.CelledArtifacts.pairs]](0.9); `pairSrc` receives the
    * face's own [[Pins]] (BenchFacesSpec pins face ≡ declared query). */
  private[graft] def linkPredictionOver(
      pairSrc: Option[Pins] => DataFrame): DataFrame = {
    val pins = new Pins
    val hits = pins(pairSrc(Some(pins))
      .select("doc_a", "doc_b"))
    val ed = hits.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(hits.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val out = ed.as("x").join(ed.as("y"),
        col("y.src") === col("x.dst") && col("x.src") < col("y.dst"))
      .select(col("x.src").as("a"), col("y.dst").as("b"))
      .join(ed.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"), "left_anti")
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("cn"))
      .orderBy(col("cn").desc, col("doc_a"), col("doc_b"))
      .limit(TopLinks)
    Release.onFirstExecution(out, () => pins.release())
  }

  private[graft] def q155Face(s: org.apache.spark.sql.SparkSession, dir: String,
      art: TierNineteen.CelledArtifacts): org.apache.spark.sql.DataFrame =
    linkPredictionOver(_ => art.pairs(0.9))

  val all: Seq[Q] = Seq(q154, q155)
}
