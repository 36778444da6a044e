package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step that turns
  * pairwise near-dup DETECTIONS (q23/q26/q28 output) into dedup GROUPS.
  * Pairwise dropping (q53) under-deduplicates when similarity chains:
  * A≈B, B≈C but A̸≈C still means {A,B,C} is one duplicate cluster and one
  * survivor should remain. That requires components, not pairs.
  *
  * Algorithm: hash-min pointer rounds WITH GRAPH CONTRACTION (the
  * MapReduce-CC family of Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14). Each round every active super-node
  * points to the min of itself and its neighbors; the edge list is then
  * REWRITTEN through those pointers — intra-cluster edges become
  * self-loops and vanish. On near-dup graphs (dense, clique-ish clusters)
  * the edge list collapses almost entirely in round one, so later rounds
  * cost nothing — unlike plain label propagation, which re-scans the FULL
  * edge list every round for as many rounds as the graph diameter. A
  * pathological long-chain graph still degrades to O(n) rounds (the
  * documented remedy is alternating large/small-star contraction — same
  * join/agg building blocks); near-dup similarity is nearly transitive,
  * so real dedup graphs terminate in a handful of rounds.
  *
  * Every round's outputs are materialized through `localCheckpoint` —
  * NOT plain persist: iterative DataFrames that reference the previous
  * round twice double their logical plan per round, and the driver dies
  * assembling a 2^rounds-node tree long before any data moves. Lineage
  * truncation keeps the plan O(1) per round. localCheckpoint blocks are
  * executor-local (not fault-tolerant to executor loss); a multi-hour
  * production run would use reliable `checkpoint()` instead — same
  * truncation, durable blocks.
  *
  * The result is exact and deterministic: the fixpoint (component-min
  * labeling) does not depend on round count or partitioning.
  */
object Components {

  /** Label every node with the smallest node id in its connected
    * component. `nodes`: one `id BIGINT` row per node (must cover every
    * endpoint in `edges`; isolated nodes keep their own label). `edges`:
    * `(src, dst)` BIGINT pairs, either orientation, duplicates and
    * self-loops harmless. Returns `(id, lbl)`.
    */
  def connected(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 100): DataFrame = {
    // active contracted edge set, canonical (u < v); materializing this
    // runs the upstream detector exactly once
    // every checkpoint goes through freshLeaf: localCheckpoint PRESERVES
    // the replaced plan's optimizer stats, and join-size estimates
    // multiply — compounding them across rounds grows the BigInt estimate
    // geometrically until stats estimation itself hangs the driver (see
    // GraftSqlBridge.freshLeaf)
    def truncate(df: DataFrame): DataFrame =
      GraftSqlBridge.freshLeaf(df.localCheckpoint(true))
    var cur = truncate(edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")))
    // node -> super-node pointer, composed across rounds
    var mapping = truncate(nodes.select(col("id"), col("id").as("lbl")))
    var rounds = 0
    var active = cur.count()
    while (active > 0 && rounds < maxRounds) {
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
      active = cur.count()
      rounds += 1
    }
    GraftSqlBridge.releaseLeaf(cur) // the final (empty) edge table
    if (active != 0) {
      GraftSqlBridge.releaseLeaf(mapping) // don't leak blocks on the failure path
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds " +
          "(pathological diameter — use alternating star contraction for such graphs)")
    }
    mapping
  }
}
