package graft.operators

import graft.{Q, Tables}
import graft.Determinism._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 9 — round-6 additions: corpus PREPARATION (the step after dedup and
  * filtering — chunking documents into training windows, mixing sources under
  * quotas), a second exactly-oracle-checked sketch (deterministic HyperLogLog,
  * the cardinality counterpart of q54's Count-Min), the k-means training step
  * that produces q43/q62's IVF centroids, and the one relational shape the
  * inventory lacked (a multi-way fact⋈dims join over the previously-unused
  * `part`/`supplier` tables). Determinism follows the established conventions:
  * integer/affine-modular arithmetic where possible ([[TierFour.A0]] family),
  * DECIMAL sums for money ([[graft.Determinism]]), element-order-deterministic
  * dot products ([[graft.expressions.DotProduct]]) for float math.
  */
object TierNine {
  import TierFour.{A0, B0, P}

  /** Document chunking — fixed-size sliding token windows (size 32, stride
    * 24, i.e. 8-token overlap), the canonical "split long documents into
    * training sequences" preparation step. Chunk starts are every 24 tokens
    * while text remains, so trailing chunks may be short (no padding — the
    * packer downstream owns that).
    *
    * Scale: narrow per-row transform (split → `transform(sequence(...))` →
    * `posexplode`), zero shuffles, fully inside whole-stage codegen; output
    * size ≈ input·(32/24). At 100 TB this runs at scan speed and the ORDER BY
    * is the oracle convention, not a plan stage the pipeline needs.
    */
  val q63 = Q("q63_doc_chunking",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, unnest(range(0, len(toks), 24)) AS i, toks FROM t)
      |SELECT doc_id, CAST(i // 24 AS BIGINT) AS chunk_id,
      |       CAST(len(list_slice(toks, i + 1, i + 32)) AS BIGINT) AS n_tokens,
      |       array_to_string(list_slice(toks, i + 1, i + 32), ' ') AS chunk_text
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("toks"))
      // a token-less document yields zero chunks (DuckDB's range(0,0) is
      // empty; Spark's sequence(0,-1,·) THROWS, so guard explicitly —
      // pinned in ShortDocSpec)
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, size(toks) - 1, 24), x -> slice(toks, x + 1, 32))"))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Affine doc_id hash shared with q48 — `doc_id % P` BEFORE the multiply
    * so the Int64 product never wraps for any non-negative id (the round-4
    * ADVICE fix, TierSix.scala q48). */
  private def idHash(c: Column): Column = ((c % P) * A0 + B0) % P

  /** Per-source quota sampling — keep at most K=10 documents per `source`,
    * chosen by affine hash of doc_id (deterministic, retry-stable, no
    * randomness; same guarantees as q48's stratified sample but with an
    * exact per-group CAP instead of a rate). This is the data-mixing
    * primitive: "at most N documents from any one domain".
    *
    * Scale: one shuffle on `source`, and Catalyst already does the first
    * phase of the classic two-phase refinement for us: the executed plan
    * carries `WindowGroupLimit` BEFORE the exchange (rank-limit pushdown,
    * audited round 6), so each input partition forwards at most K rows per
    * source — the shuffle moves O(K · partitions) rows per group, not the
    * group. For a group so hot that even that bound hurts, the manual
    * pre-filter by hash threshold ≈ K/|group| (q48's rate shape) remains
    * the escape hatch.
    */
  val q64 = Q("q64_source_quota",
    s"""SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM (
       |  SELECT source, doc_id, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY ((doc_id % $P) * $A0 + $B0) % $P, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= 10 ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("source")
      .orderBy(idHash(col("doc_id")).asc, col("doc_id").asc)
    Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
      .orderBy("source", "doc_id")
  }

  /** Deterministic HyperLogLog over `events.user_id` — the SECOND sketch
    * that oracle-checks exactly (q54's Count-Min being the first): with a
    * shared affine hash family the registers are `max(rho)` per bucket —
    * order-independent — and the harmonic-mean denominator is kept as an
    * EXACT INTEGER `s_scaled = Σ 2^(r_max − reg_j)` (≤ 64·2²⁶, no float
    * sum), so the only float op is one final multiply+divide both engines
    * perform identically. Raw HLL estimate (Flajolet α₆₄·m²/Σ2^(−reg)), no
    * small/large-range corrections — those need libm `ln` (engine-specific
    * bits); the production path for corrections is Spark's own
    * `approx_count_distinct` ([[graft.functions.Sketches]], tested by
    * tolerance in ScalaTest).
    *
    * rho via `length(bin(w))` — both engines print minimal binary strings,
    * so 26 − bitlen(w) is the leading-zero count of the 25-bit window
    * (w = h/64 < 2²⁵ since h < P). Ids are non-negative (q48 precondition);
    * `% P` before the multiply prevents Int64 wrap at any id magnitude.
    *
    * Hash quality is load-bearing in a way the q54/q26 family's affine
    * hashes are not: an affine map sends consecutive ids to an arithmetic
    * progression mod P, whose leading-zero statistics are NOT iid-uniform —
    * measured 81 % overestimate at n=1500. One squaring round after the
    * affine mix (h ← h² mod P; h < 2³¹ so h² < 2⁶² never wraps) breaks the
    * linearity: measured 12 % error at n=1500, inside raw-HLL's 1.04/√64.
    *
    * Scale: ONE partial+final aggregation to ≤64 register rows (map-side
    * max per bucket — the sketch is mergeable by construction), then
    * driver-scale arithmetic. This is the cheapest possible distinct-count
    * shape at 100 TB: no distinct shuffle of the key universe (q17's exact
    * form), just 64 longs per partition. The `n_true` column is the
    * VERIFICATION side only (it IS the exact-distinct shuffle) — a
    * production run outputs the registers/estimate alone.
    */
  /** Append q65's HLL hash column `h` (affine mix + ONE squaring round —
    * the linearity-breaking step the scaladoc above measures) to any
    * frame. Single definition shared by q65 and the Tier-68 register
    * rollups so the sketches cannot drift. */
  private[graft] def hllWithH(df: org.apache.spark.sql.DataFrame,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    df.withColumn("graft_h0", ((id % P) * A0 + B0) % P)
      .withColumn("h", (col("graft_h0") * col("graft_h0")) % P)
      .drop("graft_h0")

  /** The register value ρ for a hashed row: 26 − bitlen(h/64) — the
    * leading-zero count of the 25-bit window (q65's formulation, both
    * engines print minimal binary strings). */
  private[graft] def hllRho: org.apache.spark.sql.Column =
    lit(26) - when((col("h") / lit(64L)).cast("long") === 0, 0)
      .otherwise(length(bin((col("h") / lit(64L)).cast("long"))))

  /** The HLL bucket for a hashed row. */
  private[graft] def hllBucket: org.apache.spark.sql.Column = col("h") % 64

  val q65 = Q("q65_hll_sketch",
    s"""WITH h0 AS (
       |  SELECT ((user_id % $P) * $A0 + $B0) % $P AS h0 FROM events),
       |h AS (SELECT (h0 * h0) % $P AS h FROM h0),
       |r AS (
       |  SELECT h % 64 AS bucket,
       |         max(26 - (CASE WHEN h // 64 = 0 THEN 0
       |                        ELSE length(bin(h // 64)) END)) AS reg
       |  FROM h GROUP BY 1),
       |mx AS (SELECT max(reg) AS r_max, CAST(count(*) AS BIGINT) AS nb FROM r),
       |s AS (
       |  SELECT r_max,
       |         CAST(sum(CAST(1 AS BIGINT) << (r_max - reg))
       |              + (64 - nb) * (CAST(1 AS BIGINT) << r_max) AS BIGINT) AS s_scaled
       |  FROM r CROSS JOIN mx GROUP BY r_max, nb),
       |t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_true FROM events)
       |SELECT CAST(64 AS BIGINT) AS m, CAST(r_max AS BIGINT) AS r_max, s_scaled, n_true,
       |       round(0.7213 / (1 + 1.079/64) * (4096 * (CAST(1 AS BIGINT) << r_max))
       |             / s_scaled, 6) AS est
       |FROM s CROSS JOIN t""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val regs = hllWithH(ev.select("user_id"), col("user_id"))
      .groupBy(hllBucket.as("bucket"))
      .agg(max(hllRho).as("reg"))
    val mx = regs.agg(max("reg").as("r_max"), count(lit(1)).as("nb"))
    val summ = regs.crossJoin(broadcast(mx))
      .agg(
        first("r_max").as("r_max"), first("nb").as("nb"),
        sum(expr("shiftleft(cast(1 as bigint), r_max - reg)")).as("s_present"))
      .select(col("r_max"),
        (col("s_present") + (lit(64) - col("nb")) *
          expr("shiftleft(cast(1 as bigint), r_max)")).cast("long").as("s_scaled"))
    val nTrue = ev.agg(count_distinct(col("user_id")).as("n_true"))
    summ.crossJoin(broadcast(nTrue))
      .select(lit(64L).as("m"), col("r_max").cast("long").as("r_max"),
        col("s_scaled"), col("n_true"),
        round(lit(0.7213) / (lit(1) + lit(1.079) / lit(64)) *
          (lit(4096) * expr("shiftleft(cast(1 as bigint), r_max)")) / col("s_scaled"), 6)
          .as("est"))
  }

  /** Multi-way fact⋈dimensions join — TPC-H Q9's shape over the previously
    * unused `part`/`supplier` tables: PROMO-part revenue per nation per
    * order year. Money in exact DECIMAL ([[graft.Determinism]]).
    *
    * Scale posture: `nation` is broadcast-hinted (fixed 25 rows at any SF).
    * `part`/`supplier`/`orders` all scale with the data, so NO hints — at
    * test SF AQE broadcasts them at runtime; at 100 TB they shuffle on
    * their keys, which is correct (a forced broadcast of a 10⁹-row part
    * table would OOM every executor). The `p_type = 'PROMO'` filter is
    * pushed into the part scan BEFORE the join (PushedFilters), shrinking
    * the build side 5×.
    */
  val q66 = Q("q66_profit_join",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part").filter(col("p_type") === "PROMO")
    val supp = Tables.load(s, dir, "supplier")
    val nation = Tables.load(s, dir, "nation")
    val orders = Tables.load(s, dir, "orders")
    li.join(part, col("p_partkey") === col("l_partkey"))
      .join(supp, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(nation), col("n_nationkey") === col("s_nationkey"))
      .join(orders, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        f6(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("nation", "o_year")
  }

  /** One Lloyd iteration of k-means over the embeddings — the TRAINING step
    * that produces the centroids q43/q62's IVF index probes (those queries
    * consume label-group centroids; a production IVF index k-means-trains
    * its own). k=4 seeds = vectors 0..3 (deterministic init); assign each
    * vector to its nearest seed (squared L2 via the dot-product identity
    * ‖e−c‖² = e·e − 2e·c + c·c, each dot element-order-deterministic
    * through [[graft.expressions.DotProduct]] / `list_dot_product`), recompute
    * per-cluster dimension means (6-dp-rounded — the q43 centroid
    * convention), re-assign, and report cluster sizes.
    *
    * Scale: centroids are k×dim ≈ KBs at any corpus size — both assignment
    * passes broadcast them (zero shuffle on the embedding side); the mean
    * recompute is one partial+final agg keyed by (cluster, dim). Ties in
    * the argmin break on lower cluster id (pinned row_number order).
    */
  /** Shared oracle-SQL prefix for the Lloyd step: seeds → assignment →
    * 6-dp-rounded per-cluster dimension means (`cent`) → re-assignment
    * (`a1`). Used by q67 (cluster sizes) and q70 (trained-IVF probe). */
  private[operators] val lloydSql: String =
    """v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |seeds AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id < 4),
      |d0 AS (
      |  SELECT vec_id, cid,
      |         list_dot_product(e, e) - 2 * list_dot_product(e, c)
      |           + list_dot_product(c, c) AS d
      |  FROM v CROSS JOIN seeds),
      |a0 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
      |    FROM d0) WHERE rk = 1),
      |cent AS (
      |  SELECT cid, list(round(av, 6) ORDER BY j) AS c FROM (
      |    SELECT a0.cid, j.j, avg(v.e[j.j]) AS av
      |    FROM a0 JOIN v USING (vec_id)
      |    CROSS JOIN (SELECT unnest(range(1, 65)) AS j) AS j
      |    GROUP BY 1, 2) GROUP BY cid),
      |d1 AS (
      |  SELECT vec_id, cid,
      |         list_dot_product(e, e) - 2 * list_dot_product(e, c)
      |           + list_dot_product(c, c) AS d
      |  FROM v CROSS JOIN cent),
      |a1 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
      |    FROM d1) WHERE rk = 1)""".stripMargin

  private[operators] def dotc(x: Column, y: Column) = call_function("graft_dot", x, y)

  private[graft] def embOf(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
  }

  /** Nearest-centroid assignment (squared L2 via the dot identity, ties on
    * lower cid) — centroids broadcast, and the argmin is a partial+final
    * `min(struct(d, cid))` aggregation, NOT a window: a vector's k
    * candidate rows are born in one partition (broadcast expansion), so
    * the map-side partial collapses them to one row BEFORE the vec_id
    * shuffle — n rows move, none sort. A `row_number` window would shuffle
    * and sort all n·k rows. Struct ordering is lexicographic (d ASC, then
    * cid ASC) — the pinned tie-break, same as the oracle's row_number. */
  /** Per-(vector, centroid) squared-L2 candidate frame via the dot
    * identity — the shared expansion assignTo and the multi-probe widening
    * ([[TierEleven.knnJoin]]) both min-agg over. */
  private[operators] def candidates(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("d",
        dotc(col("e"), col("e")) - lit(2) * dotc(col("e"), col("c"))
          + dotc(col("c"), col("c")))

  private[graft] def assignTo(emb: DataFrame, cents: DataFrame): DataFrame =
    candidates(emb, cents)
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cid"))

  /** The trained-IVF INDEX as rows ready to LAY OUT by cell —
    * `(cell, vec_id, e)` with cell = q67's Lloyd-trained nearest centroid.
    * Writing this frame `Warehouse.writePartitioned(_, path, "cell")`
    * turns the q70 probe into a one-directory scan: the cell filter is a
    * PARTITION filter, so 100 TB of vectors cost one cell's worth of I/O
    * per probe — the "cell id = write-time partition key" posture in
    * [[q70]]'s scaladoc, executed and gated in AnnRecallSpec (pruned
    * file set + pruned-store probe ≡ q70's answer). */
  def ivfIndex(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val emb = embOf(s, dir)
    assignTo(emb, lloydCentroids(s, dir))
      .select(col("vec_id"), col("cid").as("cell"))
      .join(emb, "vec_id")
  }

  /** One Lloyd step from the deterministic seeds: the 6-dp-rounded
    * per-cluster dimension means (`cent` of [[lloydSql]]). The single
    * trainer definition lives in [[IvfStore.train]] (the store's frozen
    * quantizer and these queries must never drift). */
  private[graft] def lloydCentroids(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    IvfStore.train(embOf(s, dir), 4)

  val q67 = Q("q67_kmeans_lloyd",
    s"""WITH $lloydSql
       |SELECT CAST(cid AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS csize
       |FROM a1 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    assignTo(embOf(s, dir), lloydCentroids(s, dir))
      .groupBy("cid").agg(count(lit(1)).as("csize"))
      .select(col("cid").cast("long").as("cluster"), col("csize"))
      .orderBy("cluster")
  }

  /** Sequence packing — concatenate the whole corpus token stream in
    * (doc_id, position) order and split it into fixed 64-token training
    * bins (the GPT-style "concat-and-split" packer; the counterpart of
    * q63's per-document chunking). Output per bin: token count (64 except
    * the tail), how many documents the bin spans, and its first/last doc —
    * the packing manifest a loader shards by.
    *
    * Scale: the global token index comes from [[Cumulative.rowNumber]]'s
    * two-pass distributed prefix sum — range-partition, per-partition
    * local ranks, broadcast per-partition offsets — so the total order
    * costs one range shuffle and NO single-partition stage at any corpus
    * size; the bin groupBy then shuffles on `bin`, which range-partitioning
    * already nearly co-located.
    */
  val q68 = Q("q68_sequence_packing",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |c AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos FROM t),
      |r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id, pos) AS idx FROM c)
      |SELECT (idx - 1) // 64 AS bin, CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), t => t =!= "")).as(Seq("pos", "tok")))
      .select("doc_id", "pos")
    val ranked = Cumulative.rowNumber(s, toks,
      Seq(col("doc_id").asc, col("pos").asc), "idx")
    ranked
      .groupBy(expr("(idx - 1) div 64").as("bin"))
      .agg(count(lit(1)).as("n_tokens"),
        count_distinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("bin")
  }

  /** Vector-space cluster dedup — q55's clustering applied to the EMBEDDING
    * modality: q35's exact cosine pairs (≥ 0.45) → connected components
    * ([[Components.connected]], same contraction engine) → cluster-size
    * histogram. The point is composability: the component machinery is
    * modality-agnostic, so text near-dups (q55), vector near-dups (here),
    * or any other pair source cluster through the identical code path.
    *
    * Scale: the pair stage here is the exact O(n²) anchor (q35); the
    * production pair source is the bucketed LSH/IVF path (q29/q61, q43/q62
    * — bucket id as join key), feeding the same `Components` call. The CC
    * stage is O(diameter) rounds on the pair list, with the alternating-
    * star fallback for pathological shapes.
    */
  val q69 = Q("q69_embedding_dedup_clusters",
    """WITH RECURSIVE
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS ua, b.vec_id AS ub
      |  FROM v a JOIN v b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(a.e, b.e) /
      |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      |        >= 0.45),
      |edges AS (SELECT ua AS u, ub AS w FROM pairs
      |          UNION SELECT ub, ua FROM pairs),
      |nodes AS (SELECT DISTINCT vec_id AS id FROM embeddings),
      |reach(id, lbl) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.w, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.w),
      |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
      |cl AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize FROM lab GROUP BY lbl)
      |SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters
      |FROM cl GROUP BY csize ORDER BY csize""".stripMargin) { (s, dir) =>
    val nodes = Tables.load(s, dir, "embeddings").select(col("vec_id").as("id"))
    val pairs = TierFive.embeddingPairs(s, dir)
      .select(col("vec_id_a").as("src"), col("vec_id_b").as("dst"))
    Components.connected(nodes, pairs)
      .groupBy("lbl").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
      .orderBy("csize")
  }

  /** The trained-IVF ANN end to end: train the coarse quantizer (q67's
    * Lloyd step), index every vector by its trained cell, probe the query's
    * nearest cell, rank by exact cosine — the full production story
    * train → index → probe in one declared plan (q43/q62 used label-group
    * centroids as a stand-in; here the index comes from the engine's own
    * training step).
    *
    * Scale: centroids broadcast everywhere (k×dim ≈ KBs); the cell
    * assignment is the write-time partition key at 100 TB (cell id →
    * partition/bucket), the probe scans 1/k of the corpus per probed cell,
    * and the top-k is TakeOrderedAndProject.
    */
  val q70 = Q("q70_ann_ivf_trained",
    s"""WITH $lloydSql,
       |q0 AS (SELECT e AS qv FROM v WHERE vec_id = 0),
       |bd AS (
       |  SELECT cid, list_dot_product(c, c) - 2 * list_dot_product(c, qv)
       |           + list_dot_product(qv, qv) AS d
       |  FROM cent CROSS JOIN q0),
       |best AS (SELECT cid FROM bd ORDER BY d ASC, cid ASC LIMIT 1)
       |SELECT vec_id, round(list_dot_product(e, qv) /
       |    (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
       |FROM a1 JOIN v USING (vec_id) JOIN best USING (cid) CROSS JOIN q0
       |WHERE vec_id <> 0
       |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
    val emb = embOf(s, dir)
    val cents = lloydCentroids(s, dir)
    val q0 = emb.filter(col("vec_id") === 0).select(col("e").as("qv"))
    val best = cents.crossJoin(broadcast(q0))
      .withColumn("d",
        dotc(col("c"), col("c")) - lit(2) * dotc(col("c"), col("qv"))
          + dotc(col("qv"), col("qv")))
      .orderBy(col("d").asc, col("cid").asc).limit(1)
      .select("cid")
    assignTo(emb, cents)
      .join(broadcast(best), "cid")
      .join(emb, "vec_id")
      .crossJoin(broadcast(q0))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos", dotc(col("e"), col("qv"))
        / (sqrt(dotc(col("e"), col("e"))) * sqrt(dotc(col("qv"), col("qv")))))
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Weighted corpus mixing — per-language sampling RATES (en 50 %, es
    * 30 %, zh 20 %, others 10 %, in ppm), decided per document by the
    * affine doc_id hash against the language's threshold: the "mixing
    * ratios" step of training-data assembly (q48 is one flat rate, q64 an
    * exact cap; this is the weighted-rates form). Deterministic and
    * retry-stable like both. Output: per language, the target ppm, totals,
    * and the achieved ppm (integer division).
    *
    * Scale: a stateless codegen'd per-row predicate + ONE partial+final
    * aggregation — no shuffle of the kept rows themselves (a production
    * job materializes `keep = 1` rows with zero extra stages). Hash-range
    * note: P mod 10⁶ ≠ 0, so thresholds carry a ≤ 5·10⁻⁴ relative bias —
    * irrelevant for mixing (and identical on both engines); a
    * bias-critical consumer rescales by P div 10⁶ instead.
    */
  val q71 = Q("q71_weighted_mix",
    s"""WITH k AS (
       |  SELECT lang,
       |    CASE lang WHEN 'en' THEN 500000 WHEN 'es' THEN 300000
       |              WHEN 'zh' THEN 200000 ELSE 100000 END AS target_ppm,
       |    CASE WHEN ((((doc_id % $P) * $A0 + $B0) % $P) % 1000000) <
       |      CASE lang WHEN 'en' THEN 500000 WHEN 'es' THEN 300000
       |                WHEN 'zh' THEN 200000 ELSE 100000 END
       |      THEN 1 ELSE 0 END AS keep
       |  FROM documents)
       |SELECT lang, CAST(max(target_ppm) AS BIGINT) AS target_ppm,
       |       CAST(count(*) AS BIGINT) AS n_total,
       |       CAST(sum(keep) AS BIGINT) AS n_kept,
       |       CAST(sum(keep) * 1000000 // count(*) AS BIGINT) AS kept_ppm
       |FROM k GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val rate = expr("CASE lang WHEN 'en' THEN 500000 WHEN 'es' THEN 300000 " +
      "WHEN 'zh' THEN 200000 ELSE 100000 END")
    Tables.load(s, dir, "documents")
      .select(col("lang"), rate.as("target_ppm"),
        when((idHash(col("doc_id")) % 1000000) < rate, 1L).otherwise(0L).as("keep"))
      .groupBy("lang")
      .agg(max("target_ppm").cast("long").as("target_ppm"),
        count(lit(1)).as("n_total"), sum("keep").as("n_kept"))
      .withColumn("kept_ppm", expr("n_kept * 1000000 div n_total"))
      .orderBy("lang")
  }

  /** Histogram-based quantile estimation — the 100 TB sketch path for
    * q40's exact percentiles: one fixed-width histogram (width 5 over the
    * non-negative `value` domain) per event_type, then nearest-rank
    * selection with in-bucket linear interpolation. The THIRD exactly-
    * oracle-checked sketch (after Count-Min q54 and HLL q65): bucket
    * counts, cumulative ranks, and target ranks are all integers; the only
    * float op is the final interpolation, mirrored expression-for-
    * expression on both engines. Estimate error is bounded by the bucket
    * width (±5), vs q40's exact-but-expensive `percentile`.
    *
    * Scale: ONE partial+final aggregation (map-side combine) to ≤100
    * histogram rows per group; the cumulative window runs over those ≤100
    * rows — the windows here sort sketch cells, never data. q40's exact
    * percentile holds all values per group; this holds 100 longs.
    */
  val q72 = Q("q72_histogram_quantile",
    """WITH h AS (
      |  SELECT event_type, CAST(floor(value / 5) AS BIGINT) AS b,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, b, cnt,
      |         sum(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,
      |         sum(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |sel AS (
      |  SELECT event_type, max(n) AS n,
      |         min(CASE WHEN cum >= (5*n+9) // 10 THEN b END) AS b50,
      |         min(CASE WHEN cum >= (9*n+9) // 10 THEN b END) AS b90
      |  FROM c GROUP BY 1)
      |SELECT s.event_type,
      |  round(5.0 * s.b50 + 5.0 * ((5*s.n+9) // 10 - (c5.cum - c5.cnt)) / c5.cnt, 6) AS p50_est,
      |  round(5.0 * s.b90 + 5.0 * ((9*s.n+9) // 10 - (c9.cum - c9.cnt)) / c9.cnt, 6) AS p90_est
      |FROM sel s
      |JOIN c c5 ON c5.event_type = s.event_type AND c5.b = s.b50
      |JOIN c c9 ON c9.event_type = s.event_type AND c9.b = s.b90
      |ORDER BY s.event_type""".stripMargin) { (s, dir) =>
    val h = Tables.load(s, dir, "events")
      .groupBy(col("event_type"), floor(col("value") / 5).cast("long").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val c = h
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("event_type").orderBy("b")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
    val sel = c.groupBy("event_type").agg(
      max("n").as("n"),
      min(expr("CASE WHEN cum >= (5*n+9) div 10 THEN b END")).as("b50"),
      min(expr("CASE WHEN cum >= (9*n+9) div 10 THEN b END")).as("b90"))
    val c5 = c.select(col("event_type"), col("b").as("b50"),
      col("cnt").as("cnt5"), col("cum").as("cum5"))
    val c9 = c.select(col("event_type"), col("b").as("b90"),
      col("cnt").as("cnt9"), col("cum").as("cum9"))
    sel.join(c5, Seq("event_type", "b50")).join(c9, Seq("event_type", "b90"))
      .select(col("event_type"),
        round(lit(5.0) * col("b50")
          + lit(5.0) * (expr("(5*n+9) div 10") - (col("cum5") - col("cnt5"))) / col("cnt5"), 6)
          .as("p50_est"),
        round(lit(5.0) * col("b90")
          + lit(5.0) * (expr("(9*n+9) div 10") - (col("cum9") - col("cnt9"))) / col("cnt9"), 6)
          .as("p90_est"))
      .orderBy("event_type")
  }

  /** SimHash near-dup SCREEN, batch anchor — [[TierSeven.hammingScreen]]
    * checking an incoming batch (every 7th document's signature) against
    * the full corpus signature store: for each incoming doc, every corpus
    * signature within Hamming distance ≤ 3 (exact recall by q59's
    * pigeonhole). Self-matches at distance 0 are the "seen before"
    * signal — this is the admission screen a growing corpus runs on every
    * new batch BEFORE ingesting it (q60 is the MinHash flavor against a
    * persisted index; this is the signature-store flavor, and the same
    * stateless plan screens a live STREAM — s21 proves streamed ≡ this).
    */
  val q73 = Q("q73_simhash_screen",
    s"""WITH sigs AS (${TierFour.simhashSelect}),
       |inc AS (SELECT doc_id, simhash FROM sigs WHERE doc_id % 7 = 0),
       |cc AS (
       |  SELECT doc_id, simhash, j,
       |         (simhash >> (j*16)) & CASE WHEN j = 3 THEN 32767 ELSE 65535 END AS ck
       |  FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS j)),
       |ci AS (
       |  SELECT doc_id, simhash, j,
       |         (simhash >> (j*16)) & CASE WHEN j = 3 THEN 32767 ELSE 65535 END AS ck
       |  FROM inc CROSS JOIN (SELECT unnest(range(4)) AS j)),
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS corpus_id,
       |         i.simhash AS si, c.simhash AS sc
       |  FROM ci i JOIN cc c ON i.j = c.j AND i.ck = c.ck)
       |SELECT doc_id, corpus_id, CAST(bit_count(xor(si, sc)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(si, sc)) <= 3
       |ORDER BY doc_id, corpus_id""".stripMargin) { (s, dir) =>
    val sigs = TierFour.simhashSigs(s, dir).persist() // both sides read it
    TierSeven.hammingScreen(sigs.filter(col("doc_id") % 7 === 0), sigs)
      .orderBy("doc_id", "corpus_id")
  }

  val all: Seq[Q] = Seq(q63, q64, q65, q66, q67, q68, q69, q70, q71, q72, q73)
}
