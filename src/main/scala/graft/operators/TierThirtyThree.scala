package graft.operators

import graft.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 33 (round 10, fifth wave): PRODUCT QUANTIZATION (Jégou et al.,
  * TPAMI 2011) — the memory-side ANN scale lever the IVF family
  * (q43/q62/q70, `IvfStore`) doesn't cover: compress each 64-dim vector
  * to M=4 sub-codes (one [[IvfStore.train]] Lloyd step per 16-dim
  * subspace, k=4 — 4 bytes/vector, a 64× compression of the float
  * store) and answer queries by ASYMMETRIC DISTANCE (ADC): the query
  * stays exact, each database vector costs M table lookups instead of a
  * 64-dim scan.
  *
  *  - q150: the PQ ENCODE — every vector's 4 sub-codes.
  *  - q151: PQ SEARCH for the pinned probe (vec 0) — the production
  *    two-stage shape: ADC SHORTLIST (distance = Σ_m ‖q_m −
  *    c_{m,code_m}‖², the 4 per-subspace terms joined as COLUMNS and
  *    summed in one fixed expression tree — never an aggregation, so
  *    float add order stays bit-identical across engines) of the top
  *    [[Short]], then EXACT RE-RANK of just those raw vectors to the
  *    final top-10 (recall floor spec-gated — raw ADC@10 is ~0.1 on
  *    this fixture, re-ranked ≥ 0.7/0.8: compression costs you inside
  *    the shortlist, not the answer).
  *
  * Scale: codebooks are M·k×(dim/M) ≈ KBs at any corpus size — training
  * scans are broadcast-side like q67; the encoded table is 4 ints/vector
  * (the store a 100 TB corpus actually keeps in RAM); ADC probes touch
  * codes only, and the exact stage reads [[Short]] raw vectors, not the
  * corpus. Codes/centroid determinism: the q67/q43 conventions
  * (deterministic first-k seeds, 6-dp-rounded means, argmin ties to the
  * lower cid, element-order-deterministic dots).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star ANN op.
  */
object TierThirtyThree {

  private val M = 4 // subspaces
  private val SubDim = 16 // 64 / M
  private val K = 8 // codewords per subspace
  private val TopK = 10
  private val Short = 100 // ADC shortlist re-ranked exactly

  /** Oracle CTEs for one subspace's Lloyd step + final assignment —
    * TierNine.lloydSql's shape over the m-th 16-dim slice (DuckDB list
    * slicing is 1-based inclusive), suffix-disambiguated (no clash with
    * lloydSql's unsuffixed v/seeds/d0/a0/cent/d1/a1, so the two compose
    * in one WITH — the q156 IVF-PQ oracle). */
  private[operators] def pqSql(m: Int): String = {
    val lo = m * SubDim + 1
    val hi = (m + 1) * SubDim
    s"""s$m AS (SELECT vec_id, e[$lo:$hi] AS se FROM v),
       |seeds$m AS (SELECT vec_id AS cid, se AS c FROM s$m WHERE vec_id < $K),
       |d0$m AS (
       |  SELECT vec_id, cid,
       |         list_dot_product(se, se) - 2 * list_dot_product(se, c)
       |           + list_dot_product(c, c) AS d
       |  FROM s$m CROSS JOIN seeds$m),
       |a0$m AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
       |    FROM d0$m) WHERE rk = 1),
       |cent$m AS (
       |  SELECT cid, list(round(av, 6) ORDER BY j) AS c FROM (
       |    SELECT a0$m.cid, j.j, avg(s$m.se[j.j]) AS av
       |    FROM a0$m JOIN s$m USING (vec_id)
       |    CROSS JOIN (SELECT unnest(range(1, ${SubDim + 1})) AS j) AS j
       |    GROUP BY 1, 2) GROUP BY cid),
       |d1$m AS (
       |  SELECT vec_id, cid,
       |         list_dot_product(se, se) - 2 * list_dot_product(se, c)
       |           + list_dot_product(c, c) AS d
       |  FROM s$m CROSS JOIN cent$m),
       |a1$m AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
       |    FROM d1$m) WHERE rk = 1)""".stripMargin
  }

  private[operators] def subEmbOf(emb: DataFrame, m: Int): DataFrame =
    emb.select(col("vec_id"), slice(col("e"), m * SubDim + 1, SubDim).as("e"))

  private[operators] def subEmb(s: SparkSession, dir: String, m: Int): DataFrame =
    subEmbOf(TierNine.embOf(s, dir), m)

  /** The per-subspace codebook — one [[IvfStore.train]] Lloyd step over
    * the slice (the single trainer definition; PQ and IVF must never
    * drift). */
  private[graft] def codebookOf(emb: DataFrame, m: Int): DataFrame =
    IvfStore.train(subEmbOf(emb, m), K)

  private[graft] def codebook(s: SparkSession, dir: String, m: Int): DataFrame =
    codebookOf(TierNine.embOf(s, dir), m)

  /** `(vec_id, code0..code3)` — the encoded table. */
  private[operators] def encoded(s: SparkSession, dir: String): DataFrame =
    (0 until M).map { m =>
      TierNine.assignTo(subEmb(s, dir, m), codebook(s, dir, m))
        .select(col("vec_id"), col("cid").cast("long").as(s"code$m"))
    }.reduce(_.join(_, "vec_id"))

  val q150 = Q("q150_pq_encode",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |${(0 until M).map(pqSql).mkString(",\n")}
       |SELECT v.vec_id, ${(0 until M).map(m => s"CAST(a1$m.cid AS BIGINT) AS code$m").mkString(", ")}
       |FROM v ${(0 until M).map(m => s"JOIN a1$m ON a1$m.vec_id = v.vec_id").mkString(" ")}
       |ORDER BY v.vec_id""".stripMargin) { (s, dir) =>
    encoded(s, dir).orderBy("vec_id")
  }

  /** PQ search from probe vec 0: ADC shortlist (per subspace the probe's
    * exact slice against the database vector's RECONSTRUCTED codeword —
    * four lookup terms riding one row as columns via four broadcast
    * joins against KB-sized codebooks, so `t0+t1+t2+t3` is a fixed
    * expression tree, bit-identical on both engines), then exact
    * re-rank of the [[Short]] survivors against their raw vectors. The
    * only wide operations are the two TakeOrdereds. */
  /** `(vec_id, adc)` for every database vector vs `probe` — the four
    * per-subspace lookup terms joined as columns and summed in one fixed
    * expression tree (see [[q151]]); shared with the q156 IVF-PQ
    * composition. */
  private[operators] def adcAllOf(emb: DataFrame, probe: Seq[Double]): DataFrame = {
    def qm(m: Int): Column =
      array(probe.slice(m * SubDim, (m + 1) * SubDim).map(lit): _*)
    val terms = (0 until M).map { m =>
      val cb = codebookOf(emb, m)
      TierNine.assignTo(subEmbOf(emb, m), cb)
        .join(broadcast(cb), "cid")
        .select(col("vec_id"),
          (TierNine.dotc(qm(m), qm(m)) - lit(2) * TierNine.dotc(qm(m), col("c"))
            + TierNine.dotc(col("c"), col("c"))).as(s"t$m"))
    }
    terms.reduce(_.join(_, "vec_id"))
      .select(col("vec_id"),
        round(col("t0") + col("t1") + col("t2") + col("t3"), 6).as("adc"))
  }

  private[operators] def adcAll(s: SparkSession, dir: String,
      probe: Seq[Double]): DataFrame = adcAllOf(TierNine.embOf(s, dir), probe)

  /** The whole q151 two-stage search as one library/SQL face over any
    * `(vec_id, e ARRAY<DOUBLE>[64])` frame: per-subspace codebooks
    * trained in place (the q150 trainer), ADC shortlist of `short`, exact
    * re-rank to `(vec_id, dist)` top-`k`. Registered as the
    * `graft_pq_search` table function (r10 VERDICT #8); ExpressionSpec
    * pins SQL ≡ Scala ≡ q151. A probe drawn from the table ranks itself
    * first at dist 0 — filter the id out downstream if unwanted (q151
    * does). */
  private[graft] def pqSearch(emb: DataFrame, probe: Seq[Double],
      k: Int = TopK, short: Int = Short): DataFrame = {
    require(probe.length == M * SubDim,
      s"pqSearch: probe must have ${M * SubDim} dims, got ${probe.length}")
    val sl = adcAllOf(emb, probe).orderBy(col("adc"), col("vec_id")).limit(short)
    rerank(sl, emb, probe, k)
  }

  /** Exact re-rank of a `(vec_id, …)` shortlist against `probe`, top-k
    * in the pinned (dist, vec_id) order. */
  private[operators] def rerank(short: DataFrame, emb: DataFrame,
      probe: Seq[Double], k: Int): DataFrame = {
    val qFull: Column = array(probe.map(lit): _*)
    short.select("vec_id").join(emb, "vec_id")
      .select(col("vec_id"),
        round(TierNine.dotc(col("e"), col("e")) - lit(2) * TierNine.dotc(col("e"), qFull)
          + TierNine.dotc(qFull, qFull), 6).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  val q151 = Q("q151_pq_search",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |${(0 until M).map(pqSql).mkString(",\n")},
       |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
       |${(0 until M).map { m =>
         val lo = m * SubDim + 1
         val hi = (m + 1) * SubDim
         s"""t$m AS (
            |  SELECT a.vec_id,
            |         list_dot_product(q.qe[$lo:$hi], q.qe[$lo:$hi])
            |           - 2 * list_dot_product(q.qe[$lo:$hi], c.c)
            |           + list_dot_product(c.c, c.c) AS t
            |  FROM a1$m a JOIN cent$m c ON c.cid = a.cid CROSS JOIN q)"""
           .stripMargin
       }.mkString(",\n")},
       |sl AS (
       |  SELECT t0.vec_id, round(t0.t + t1.t + t2.t + t3.t, 6) AS adc
       |  FROM t0 JOIN t1 ON t1.vec_id = t0.vec_id
       |          JOIN t2 ON t2.vec_id = t0.vec_id
       |          JOIN t3 ON t3.vec_id = t0.vec_id
       |  WHERE t0.vec_id <> 0
       |  ORDER BY adc, t0.vec_id LIMIT $Short)
       |SELECT s.vec_id,
       |       round(list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, q.qe)
       |         + list_dot_product(q.qe, q.qe), 6) AS dist
       |FROM sl s JOIN v ON v.vec_id = s.vec_id CROSS JOIN q
       |ORDER BY dist, s.vec_id LIMIT $TopK""".stripMargin) { (s, dir) =>
    val emb = TierNine.embOf(s, dir)
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val short = adcAll(s, dir, probe)
      .filter(col("vec_id") =!= 0)
      .orderBy(col("adc"), col("vec_id"))
      .limit(Short)
    rerank(short, emb, probe, TopK)
  }

  val all: Seq[Q] = Seq(q150, q151)
}
