package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a reusable build-once / probe-many pair — the shape
  * a pipeline actually uses (build the sketch over the corpus in one pass,
  * then answer point-frequency queries against the tiny cell table without
  * ever touching the corpus again). [[graft.operators.TierSix.q54]] is the
  * DuckDB-checked anchor: it composes exactly [[build]] + [[probe]] and
  * hash-matches an oracle that recomputes the identical affine hash family.
  *
  * Determinism: cells are SUMS (order-independent, exactly reproducible)
  * and the hash family is the engine's affine-modular one over BIGINT key
  * ids — `((A0·(j+1)) mod P · (id mod P) + (B0·(j+1)) mod P) mod P mod
  * width` — never an engine-native hash. `id mod P` BEFORE the multiply
  * caps every product at (P−1)² < 2^63 (a 10⁹⁺-key id space must not wrap
  * Int64: Spark would silently go negative while DuckDB raises).
  *
  * 100 TB posture: [[build]] is one partial+final aggregation into
  * `depth·width` cells — the corpus shuffles `depth` fan-out rows per
  * DISTINCT key (not per occurrence if the caller pre-aggregates, which
  * q54 does), and the sketch itself is broadcast-sized by construction, so
  * every [[probe]] is a broadcast join however large the key stream is.
  */
object CountMin {

  private val P = 2147483647L
  private val A0 = 2654435761L
  private val B0 = 40503L

  /** Row j's cell for key `id` — shared by build and probe. `pmod` (not
    * signed `%`) on the key: a negative BIGINT id would otherwise hash to
    * a negative cell, silently splitting one key's mass across two cells
    * and breaking the ≤depth·width build bound. On nonnegative ids (all
    * oracle corpora) pmod ≡ %, so q54's oracle SQL matches unchanged. */
  private def cell(j: Column, id: Column, width: Int): Column =
    ((lit(A0) * (j + 1)) % P * pmod(id, lit(P)) + (lit(B0) * (j + 1)) % P) % P % width

  private def hashRows(df: DataFrame, depth: Int): DataFrame =
    broadcast(df.sparkSession.range(depth).select(col("id").as("j")))

  /** Build the sketch: one row per non-empty cell, `(j, cell, s)` where
    * `s = Σ freq` of the keys hashing there. `counts` must carry one row
    * per key (pre-aggregated frequencies); `id` must be a BIGINT key id
    * (e.g. a [[graft.operators.Cumulative.rowNumber]] vocabulary rank). */
  def build(counts: DataFrame, id: Column, freq: Column,
      depth: Int = 4, width: Int = 64): DataFrame =
    counts.select(id.as("cm_id"), freq.as("cm_f"))
      .crossJoin(hashRows(counts, depth))
      .groupBy(col("j"), cell(col("j"), col("cm_id"), width).as("cell"))
      .agg(sum(col("cm_f")).as("s"))

  /** Probe: append `est` (the CMS point estimate, min over the depth rows;
    * 0 for a key hashing only to empty cells) to `keys`, whose rows must be
    * distinct. `depth`/`width` must match the [[build]] call. The sketch is
    * broadcast — `keys` streams through map-side, no corpus shuffle. */
  def probe(keys: DataFrame, id: Column, sketch: DataFrame,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val out = keys.columns.toIndexedSeq.map(col)
    keys.withColumn("cm_id", id)
      .crossJoin(hashRows(keys, depth))
      .withColumn("cell", cell(col("j"), col("cm_id"), width))
      .join(broadcast(sketch), Seq("j", "cell"), "left")
      .groupBy(out: _*)
      .agg(min(coalesce(col("s"), lit(0L))).as("est"))
  }
}
