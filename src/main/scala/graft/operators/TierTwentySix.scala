package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 26 (round 8, nineteenth wave): the two graph primitives the
  * family still lacked — shortest-path (multi-source BFS) and WEIGHTED
  * propagation.
  *
  *  - q136: SEED DISTANCE — hop distance (≤ 4) from the vetted source
  *    seed set through the semantic near-dup graph: the crisp
  *    reachability measure behind q128's decayed trust (how far is this
  *    doc from anything we vetted?), and the BFS/Pregel frontier shape.
  *  - q137: WEIGHTED PageRank over the purchase graph — edge weight =
  *    purchase frequency (pure integer multiplicity, no float path), so
  *    a customer's rank mass splits proportionally to how often they
  *    buy from each supplier: the weighted-graph capability q125's
  *    uniform split cannot express.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star graph ops.
  */
object TierTwentySix {

  private val S = 1000000000000L
  private val MaxHops = 4
  private val Thr = 0.9

  /** One oracle-SQL BFS relaxation `d$i` → `d${i + 1}`: a node's new
    * distance is the min of its current one and every in-neighbor's + 1
    * (min-label BFS — monotone, so a fixed unroll of K rounds yields
    * exact distances ≤ K). */
  private def bfsIterSql(i: Int): String =
    s"""d${i + 1} AS (
       |  SELECT nid, CAST(min(d) AS BIGINT) AS d FROM (
       |    SELECT nid, d FROM d$i
       |    UNION ALL
       |    SELECT e.dst AS nid, p.d + 1 AS d
       |    FROM ed e JOIN d$i p ON p.nid = e.src)
       |  GROUP BY nid)""".stripMargin

  /** Multi-source BFS: hop distance from ANY `source = 'src0'` doc
    * through the symmetrized q121 near-dup graph, exact up to
    * [[MaxHops]]; unreached docs report −1 (the "nothing vetted is
    * anywhere near this" flag a curator reviews first).
    *
    * Scale: the frontier relaxation is one dst-keyed shuffle + one
    * min-aggregation per round — the Pregel BFS shape; the reached frame
    * is checkpointed per round ([[Components]] discipline) and never
    * exceeds |V| rows. K is fixed, so the plan is K unrolled rounds —
    * production open-ended BFS loops until the frontier empties, same
    * per-round plan.
    */
  val q136 = Q("q136_seed_distance",
    s"""WITH ${TierNineteen.embSql},
       |${TierNineteen.pairSql(Thr)},
       |ed AS (SELECT doc_a AS src, doc_b AS dst FROM hits
       |       UNION ALL SELECT doc_b, doc_a FROM hits),
       |sd AS (SELECT doc_id, (source = 'src0') AS seed FROM documents),
       |d0 AS (SELECT doc_id AS nid, CAST(0 AS BIGINT) AS d FROM sd WHERE seed),
       |${(0 until MaxHops).map(bfsIterSql).mkString(",\n")}
       |SELECT sd.doc_id, CAST(coalesce(dd.d, -1) AS BIGINT) AS hops
       |FROM sd LEFT JOIN d$MaxHops dd ON dd.nid = sd.doc_id
       |ORDER BY sd.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val hits = TierNineteen.embedPairsOf(docs.select("doc_id", "text"), Thr)
      .select("doc_a", "doc_b").persist()
    val ed = hits.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(hits.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var reached = docs.filter(col("source") === "src0")
      .select(col("doc_id").as("nid"), lit(0L).as("d"))
    for (_ <- 1 to MaxHops) {
      reached = reached
        .union(ed.join(reached, ed("src") === reached("nid"))
          .select(col("dst").as("nid"), (col("d") + 1).as("d")))
        .groupBy("nid").agg(min("d").as("d"))
      reached = org.apache.spark.sql.GraftSqlBridge.freshLeaf(
        reached.localCheckpoint(true))
    }
    docs.select(col("doc_id"))
      .join(reached.select(col("nid").as("doc_id"), col("d")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("d"), lit(-1L)).as("hops"))
      .orderBy("doc_id")
  }

  /** One oracle-SQL WEIGHTED PageRank iteration (q125's `iterSql` with
    * the uniform `r // deg` split replaced by the per-edge proportional
    * `(r * w) // W`). */
  private def wIterSql(i: Int): String = {
    val (prev, c, g, next) = (s"r$i", s"c${i + 1}", s"g${i + 1}", s"r${i + 1}")
    s"""$c AS (
       |  SELECT e.dst AS nid, CAST(sum(($prev.r * e.w) // wt.ww) AS BIGINT) AS c
       |  FROM e JOIN $prev ON $prev.nid = e.src
       |  JOIN wt ON wt.src = e.src GROUP BY 1),
       |$g AS (
       |  SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang
       |  FROM $prev WHERE nid NOT IN (SELECT src FROM e)),
       |$next AS (
       |  SELECT n.nid,
       |         CAST((15 * $S // (100 * cnt))
       |              + (85 * (coalesce($c.c, 0) + ($g.dang // cnt))) // 100
       |            AS BIGINT) AS r
       |  FROM n CROSS JOIN nn CROSS JOIN $g
       |  LEFT JOIN $c ON $c.nid = n.nid)""".stripMargin
  }

  /** Frequency-weighted PageRank: the q125 graph WITHOUT the distinct —
    * each (customer, supplier) edge carries its purchase COUNT, and a
    * customer's rank splits `(r·w) // W` across suppliers (all-integer:
    * `r·w ≤ 10¹²·|lineitem|` needs the per-edge share computed as
    * product-then-floor — Int64-safe to ~9·10⁶ purchases on one edge at
    * full rank; past that swap in DECIMAL, ranking unchanged).
    *
    * Scale: identical plan shape to q125 (edges+weights persist once,
    * one dst shuffle + a broadcast dangling scalar per round, checkpoint
    * truncation); the weight table rides the edge frame — no extra join.
    */
  val q137 = Q("q137_weighted_pagerank",
    s"""WITH e AS (
       |  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
       |         CAST(count(*) AS BIGINT) AS w
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2),
       |wt AS (SELECT src, CAST(sum(w) AS BIGINT) AS ww FROM e GROUP BY 1),
       |n AS (SELECT src AS nid FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
       |r0 AS (SELECT nid, CAST($S // cnt AS BIGINT) AS r FROM n CROSS JOIN nn),
       |${(0 until 3).map(wIterSql).mkString(",\n")}
       |SELECT nid, r AS rank_fp FROM r3 ORDER BY nid""".stripMargin) { (s, dir) =>
    val e = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
      .persist()
    val wt = e.groupBy("src").agg(sum("w").as("ww"))
    val nodes = e.select(col("src").as("nid"))
      .union(e.select(col("dst").as("nid"))).distinct()
      .join(wt.select(col("src").as("nid"), lit(true).as("has_out")), Seq("nid"), "left")
      .select(col("nid"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .persist()
    val edges = e.join(wt, "src").persist() // (src, dst, w, ww)
    val n = nodes.count()
    require(n > 0, "weighted pagerank: empty edge frame")
    var r = nodes.select(col("nid"), col("has_out"), lit(S / n).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges.join(r.select(col("nid"), col("r")), edges("src") === col("nid"))
        .select(col("dst").as("nid2"), expr("(r * w) div ww").as("c"))
        .groupBy("nid2").agg(sum("c").as("c"))
        .select(col("nid2").as("nid"), col("c"))
      val dang = r.agg(
        coalesce(sum(when(!col("has_out"), col("r")).otherwise(0L)), lit(0L)).as("dang"))
      r = nodes.crossJoin(broadcast(dang))
        .join(contrib, Seq("nid"), "left")
        .select(col("nid"), col("has_out"),
          (lit(15L * S / (100L * n)) +
            expr(s"(85 * (coalesce(c, CAST(0 AS BIGINT)) + (dang div $n))) div 100")).as("r"))
      r = org.apache.spark.sql.GraftSqlBridge.freshLeaf(r.localCheckpoint(true))
    }
    r.select(col("nid"), col("r").as("rank_fp")).orderBy("nid")
  }

  val all: Seq[Q] = Seq(q136, q137)
}
