package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 36 (round 10, eighth wave): the composed index architectures.
  *
  *  - q156: IVF-PQ SEARCH — the FAISS `IndexIVFPQ` architecture
  *    (by_residual=false variant: codes quantize the raw vectors, not
  *    cell residuals — documented simplification): q67's Lloyd-trained
  *    IVF cells prune the corpus to ONE cell, q150's PQ codes rank the
  *    survivors by ADC, and the exact re-rank touches only the final
  *    shortlist. Scan economics at 100 TB: cell pruning cuts I/O |cells|-fold
  *    (partition-pruned, the q70/`IvfStore` layout), ADC reads 4-byte
  *    codes, the exact stage reads ≤ [[CellShort]] raw vectors.
  *  - q157: CONTAINMENT SCREEN — directional near-SUPERSET detection
  *    over 8-token shingle sets: containment(a ⊆ b) = |A∩B|·10⁶ div |A|
  *    (all-integer), flagged at ≥ [[ContainPpm]]. Catches quotes,
  *    excerpts and wrapper pages that SYMMETRIC Jaccard (q23/q26) under-
  *    scores — |A∩B|/|A∪B| is tiny when b is much larger than a, but a
  *    is still fully lifted. The q101 shared-shingle economics: pairs
  *    are born from the 8-gram key join, never all-pairs.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star ANN/dedup ops.
  */
object TierThirtySix {

  private val TopK = 10
  private val CellShort = 50
  private val W = 8 // shingle width, the q89/q101 convention
  private val ContainPpm = 500000L

  /** IVF-PQ: probe = vec 0; its trained cell's members (q67's a1
    * assignment) are the only ADC candidates; exact re-rank of the
    * in-cell shortlist. */
  val q156 = Q("q156_ivfpq_search",
    s"""WITH ${TierNine.lloydSql},
       |${(0 until 4).map(TierThirtyThree.pqSql).mkString(",\n")},
       |pc AS (SELECT cid FROM a1 WHERE vec_id = 0),
       |mem AS (SELECT a1.vec_id FROM a1, pc WHERE a1.cid = pc.cid AND a1.vec_id <> 0),
       |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
       |${(0 until 4).map { m =>
         val lo = m * 16 + 1
         val hi = (m + 1) * 16
         s"""t$m AS (
            |  SELECT a.vec_id,
            |         list_dot_product(q.qe[$lo:$hi], q.qe[$lo:$hi])
            |           - 2 * list_dot_product(q.qe[$lo:$hi], c.c)
            |           + list_dot_product(c.c, c.c) AS t
            |  FROM a1$m a JOIN cent$m c ON c.cid = a.cid CROSS JOIN q
            |  WHERE a.vec_id IN (SELECT vec_id FROM mem))"""
           .stripMargin
       }.mkString(",\n")},
       |sl AS (
       |  SELECT t0.vec_id, round(t0.t + t1.t + t2.t + t3.t, 6) AS adc
       |  FROM t0 JOIN t1 ON t1.vec_id = t0.vec_id
       |          JOIN t2 ON t2.vec_id = t0.vec_id
       |          JOIN t3 ON t3.vec_id = t0.vec_id
       |  ORDER BY adc, t0.vec_id LIMIT $CellShort)
       |SELECT s.vec_id,
       |       round(list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, q.qe)
       |         + list_dot_product(q.qe, q.qe), 6) AS dist
       |FROM sl s JOIN v ON v.vec_id = s.vec_id CROSS JOIN q
       |ORDER BY dist, s.vec_id LIMIT $TopK""".stripMargin) { (s, dir) =>
    val emb = TierNine.embOf(s, dir)
    val probe = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val cells = TierNine.assignTo(emb, TierNine.lloydCentroids(s, dir))
    val probeCell = cells.filter(col("vec_id") === 0).head().getLong(1)
    val members = cells.filter(col("cid") === probeCell && col("vec_id") =!= 0)
      .select("vec_id")
    val short = TierThirtyThree.adcAll(s, dir, probe)
      .join(members, "vec_id")
      .orderBy(col("adc"), col("vec_id"))
      .limit(CellShort)
    TierThirtyThree.rerank(short, emb, probe, TopK)
  }

  /** Directional containment over distinct 8-token shingle sets:
    * `(contained, container, cont_ppm)` for every ordered pair sharing a
    * shingle with |A∩B|·10⁶ div |A| ≥ [[ContainPpm]]. */
  val q157 = Q("q157_containment",
    s"""WITH l AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, key FROM (
       |    SELECT doc_id,
       |           unnest([array_to_string(l[i:i+${W - 1}], ' ')
       |                   for i in range(1, len(l) - ${W - 2})]) AS key
       |    FROM l WHERE len(l) >= $W)),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
       |ix AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS inter
       |  FROM g a JOIN g b ON b.key = a.key AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT ix.da AS contained, ix.db AS container,
       |       (ix.inter * 1000000) // sz.n AS cont_ppm
       |FROM ix JOIN sz ON sz.doc_id = ix.da
       |WHERE (ix.inter * 1000000) // sz.n >= $ContainPpm
       |ORDER BY contained, container""".stripMargin) { (s, dir) =>
    val g = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) >= W)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("l")) - (W - 1)),
          i => concat_ws(" ", slice(col("l"), i, lit(W))))).as("key"))
      .distinct()
    val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ix = g.as("a").join(g.as("b"),
        col("b.key") === col("a.key") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    ix.join(sz.select(col("doc_id").as("da"), col("n")), "da")
      .select(col("da").as("contained"), col("db").as("container"),
        expr("(inter * 1000000) div n").as("cont_ppm"))
      .filter(col("cont_ppm") >= ContainPpm)
      .orderBy("contained", "container")
  }

  val all: Seq[Q] = Seq(q156, q157)
}
