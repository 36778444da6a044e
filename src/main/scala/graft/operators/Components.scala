package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step that turns
  * pairwise near-dup DETECTIONS (q23/q26/q28 output) into dedup GROUPS.
  * Pairwise dropping (q53) under-deduplicates when similarity chains:
  * A≈B, B≈C but A̸≈C still means {A,B,C} is one duplicate cluster and one
  * survivor should remain. That requires components, not pairs.
  *
  * Two phases, both from the MapReduce-CC family of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14:
  *
  * 1. Hash-min pointer rounds WITH GRAPH CONTRACTION. Each round every
  *    active super-node points to the min of itself and its neighbors; the
  *    edge list is then REWRITTEN through those pointers — intra-cluster
  *    edges become self-loops and vanish. On near-dup graphs (dense,
  *    clique-ish clusters) the edge list collapses almost entirely in
  *    round one, so later rounds cost nothing — unlike plain label
  *    propagation, which re-scans the FULL edge list every round for as
  *    many rounds as the graph diameter.
  * 2. Alternating LARGE-STAR / SMALL-STAR contraction, entered only when a
  *    round shrinks the active edge set by less than 25 % (a long-chain /
  *    high-diameter remnant, where hash-min degrades to one diameter hop
  *    per round). Large-star hangs every node's larger neighbors off its
  *    neighborhood minimum; small-star does the same for the smaller
  *    neighbors. The alternation is the SoCC'14 Two-Phase algorithm: it
  *    converges to disjoint min-centered stars in O(log² n) rounds
  *    (observed ≈ log n, ~10 rounds for a 10k-node path — ComponentsSpec
  *    pins this), the edge set never grows beyond its input size, and
  *    every round is the same canonical-edges groupBy/join shape as phase
  *    one. Real dedup graphs never reach phase 2; a legal-but-pathological
  *    edge list (one giant path) now converges instead of timing out.
  *
  * Every round's outputs are materialized through `localCheckpoint` —
  * NOT plain persist: iterative DataFrames that reference the previous
  * round twice double their logical plan per round, and the driver dies
  * assembling a 2^rounds-node tree long before any data moves. Lineage
  * truncation keeps the plan O(1) per round. localCheckpoint blocks are
  * executor-local (not fault-tolerant to executor loss); a multi-hour
  * production run would use reliable `checkpoint()` instead — same
  * truncation, durable blocks. The per-round `count()` fixpoint probes are
  * driver actions, but metadata-scale (one long per round) — the standard
  * iterative-algorithm control loop.
  *
  * The result is exact and deterministic: the fixpoint (component-min
  * labeling) does not depend on round count, phase switch point, or
  * partitioning.
  */
object Components {

  /** Labels plus the per-phase round counts — `connected` is the public
    * surface; the counts let specs pin the O(log n) convergence claim. */
  private[graft] final case class Result(
      labels: DataFrame, contractionRounds: Int, starRounds: Int)

  /** Label every node with the smallest node id in its connected
    * component. `nodes`: one `id BIGINT` row per node (must cover every
    * endpoint in `edges`; isolated nodes keep their own label). `edges`:
    * `(src, dst)` BIGINT pairs, either orientation, duplicates and
    * self-loops harmless. Returns `(id, lbl)`.
    */
  def connected(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 100): DataFrame =
    connectedWithStats(nodes, edges, maxRounds).labels

  // every checkpoint goes through freshLeaf: localCheckpoint PRESERVES
  // the replaced plan's optimizer stats, and join-size estimates
  // multiply — compounding them across rounds grows the BigInt estimate
  // geometrically until stats estimation itself hangs the driver (see
  // GraftSqlBridge.freshLeaf)
  private def truncate(df: DataFrame): DataFrame =
    GraftSqlBridge.freshLeaf(df.localCheckpoint(true))

  private[graft] def connectedWithStats(
      nodes: DataFrame, edges: DataFrame, maxRounds: Int = 100): Result = {
    // active contracted edge set, canonical (u < v); materializing this
    // runs the upstream detector exactly once
    var cur = truncate(edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")))
    // node -> super-node pointer, composed across rounds
    var mapping = truncate(nodes.select(col("id"), col("id").as("lbl")))
    var rounds = 0
    var active = cur.count()
    var stalled = false
    while (active > 0 && !stalled && rounds < maxRounds) {
      val prevCur = cur
      val prevMapping = mapping
      // hash-min: each super-node points to min(self, neighbors). Only the
      // SMALLER-neighbor side can lower a label, so one half-aggregation
      // over the canonical (u < v) edges suffices — l(x) = min(x, min{w :
      // (w,x)}) — instead of a groupBy over both orientations (halves the
      // agg input and skips materializing the 2× union). Nodes with no
      // smaller neighbor have no row here; the left joins below keep them.
      val l = truncate(cur.groupBy(col("v").as("node")).agg(min(col("u")).as("nm"))
        .select(col("node"), least(col("node"), col("nm")).as("newl")))
      // contract: rewrite edges through the pointers; self-loops vanish,
      // distinct collapses the duplicates contraction creates
      val lu = l.select(col("node").as("u"), col("newl").as("lu"))
      val lv = l.select(col("node").as("v"), col("newl").as("lv"))
      cur = truncate(cur
        .join(lu, Seq("u"), "left").join(lv, Seq("v"), "left")
        .select(coalesce(col("lu"), col("u")).as("a"),
          coalesce(col("lv"), col("v")).as("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
      // compose pointers into the node mapping (nodes whose super-node is
      // already final — or isolated — keep their label)
      mapping = truncate(prevMapping
        .join(l.select(col("node").as("lbl"), col("newl")), Seq("lbl"), "left")
        .select(col("id"), coalesce(col("newl"), col("lbl")).as("lbl")))
      // every truncate() above is EAGER, so the previous round's blocks —
      // and this round's pointer table — are dead now; drop them or a
      // long-lived session pins 3 RDDs per round per connected() call
      GraftSqlBridge.releaseLeaf(prevCur)
      GraftSqlBridge.releaseLeaf(prevMapping)
      GraftSqlBridge.releaseLeaf(l)
      val prevActive = active
      active = cur.count()
      rounds += 1
      // contraction earns its keep by collapsing clusters; <25 % shrink
      // means a high-diameter remnant — hand it to the star phase, which
      // converges in O(log n) rounds instead of one diameter hop per round
      stalled = active > 0 && active * 4L > prevActive * 3L
    }
    if (active == 0) {
      GraftSqlBridge.releaseLeaf(cur) // the final (empty) edge table
      Result(mapping, rounds, 0)
    } else {
      // star phase on the contracted super-node graph. Each super-node
      // label is the min of its contracted set, so the component min among
      // super-nodes IS the component min among original nodes — composing
      // star labels through the mapping stays exact.
      val (starLbl, starRounds) = stars(cur, maxRounds)
      val prevMapping = mapping
      mapping = truncate(prevMapping
        .join(starLbl.select(col("node").as("lbl"), col("slbl")), Seq("lbl"), "left")
        .select(col("id"), coalesce(col("slbl"), col("lbl")).as("lbl")))
      GraftSqlBridge.releaseLeaf(prevMapping)
      GraftSqlBridge.releaseLeaf(starLbl)
      GraftSqlBridge.releaseLeaf(cur)
      Result(mapping, rounds, starRounds)
    }
  }

  /** One large-star round: every node's strictly-larger neighbors are
    * re-hung off the minimum of its neighborhood (including itself).
    * Connectivity-preserving; never grows the canonical edge set. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
    val m = nbrs.groupBy("x").agg(min(col("y")).as("my"))
      .select(col("x"), least(col("x"), col("my")).as("m"))
    nbrs.join(m, Seq("x"))
      .filter(col("y") > col("x"))
      .select(least(col("y"), col("m")).as("u"),
        greatest(col("y"), col("m")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** One small-star round: every node and its strictly-smaller neighbors
    * are hung off the minimum of those smaller neighbors. Keyed by the
    * LARGER endpoint of each canonical edge, so no orientation union. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("v").agg(min(col("u")).as("m"))
    val toCenter = e.join(m, Seq("v"))
      .select(col("u").as("a"), col("m").as("b"))
    val selfEdge = m.select(col("v").as("a"), col("m").as("b"))
    toCenter.unionAll(selfEdge)
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** Alternate large-star/small-star to the edge-set fixpoint (disjoint
    * min-centered stars), then read labels off the stars: every node's
    * label = min(itself, neighbors). Returns `(node, slbl)` for every node
    * of `e0` plus the composed-round count. `e0` is caller-owned (not
    * released here); intermediates are swept per round. */
  private def stars(e0: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    var e = e0
    var eCount = e.count()
    var r = 0
    var fixed = false
    while (!fixed && r < maxRounds) {
      val prev = e
      val next = truncate(smallStar(largeStar(prev)))
      val nextCount = next.count()
      // both sides are distinct canonical sets: equal iff same cardinality
      // and the (next \ prev) difference is empty
      fixed = nextCount == eCount && next.exceptAll(prev).isEmpty
      if (!(prev eq e0)) GraftSqlBridge.releaseLeaf(prev)
      e = next
      eCount = nextCount
      r += 1
    }
    if (!fixed) {
      if (!(e eq e0)) GraftSqlBridge.releaseLeaf(e)
      // unreachable for physical inputs: Two-Phase converges in O(log² n)
      // rounds, so 100 rounds covers any corpus that fits in a cluster —
      // this backstop guards an implementation bug, not a legal input
      throw new IllegalStateException(
        s"star contraction did not reach its fixpoint in $maxRounds rounds")
    }
    val lbl = truncate(
      e.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
        .groupBy("node").agg(min(col("nbr")).as("mn"))
        .select(col("node"), least(col("node"), col("mn")).as("slbl")))
    if (!(e eq e0)) GraftSqlBridge.releaseLeaf(e)
    (lbl, r)
  }
}
