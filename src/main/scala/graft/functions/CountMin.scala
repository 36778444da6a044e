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

  /** Build the sketch: one row per non-empty cell, `(j, cell, s)` where
    * `s = Σ freq` of the keys hashing there ([[AffineHash]] family —
    * negative ids hash safely via pmod). `counts` must carry one row
    * per key (pre-aggregated frequencies); `id` must be a BIGINT key id
    * (e.g. a [[graft.operators.Cumulative.rowNumber]] vocabulary rank). */
  def build(counts: DataFrame, id: Column, freq: Column,
      depth: Int = 4, width: Int = 64): DataFrame =
    counts.select(id.as("cm_id"), freq.as("cm_f"))
      .crossJoin(AffineHash.rows(counts, depth, "j"))
      .groupBy(col("j"), AffineHash.slot(col("j"), col("cm_id"), width).as("cell"))
      .agg(sum(col("cm_f")).as("s"))

  /** Merge two sketches built with the SAME (depth, width): cells are sums,
    * so the merge is cell-wise addition and `merge(build(A), build(B)) ≡
    * build(A ⊎ B)` EXACTLY (SketchSpec pins the law). This is the property
    * that makes the sketch distributable at 100 TB — build per
    * partition/day/source, merge the broadcast-sized cell tables, never
    * re-scan — and it is the same algebra the streaming build (s17) runs
    * incrementally. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("j", "cell").agg(sum(col("s")).as("s"))

  /** Pack the sketch into a dense `depth·width` long array (row-major by
    * hash row j) — ≤ `depth·width` rows collected, broadcast-sized by
    * construction. Empty cells are 0, matching [[probe]]'s
    * `coalesce(·, 0)`. The packed form is what [[estCol]] (and the SQL
    * surface's `graft_cm_est`) probes without a join. */
  def toDense(sketch: DataFrame, depth: Int = 4, width: Int = 64): Array[Long] = {
    val arr = new Array[Long](depth * width)
    sketch.collect().foreach { r =>
      arr(r.getLong(0).toInt * width + r.getLong(1).toInt) = r.getLong(2)
    }
    arr
  }

  /** Point estimate as a pure Column over a [[toDense]]-packed sketch —
    * no fan-out, no join, no re-grouping: `least` over the `depth` cell
    * lookups stays inside whole-stage codegen and composes STATELESSLY
    * with streams (the DataFrame [[probe]]'s re-collapsing groupBy would
    * be a stateful aggregation there). Same hash family, same estimate,
    * and duplicate input rows pass through 1:1 (no distinct-rows
    * precondition, unlike [[probe]]). */
  def estCol(packed: Column, id: Column, depth: Int = 4, width: Int = 64): Column = {
    val cells = (0 until depth).map { j =>
      element_at(packed,
        (AffineHash.slot(lit(j.toLong), id, width) + lit(j * width) + 1).cast("int"))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  /** Probe: append `est` (the CMS point estimate, min over the depth rows;
    * 0 for a key hashing only to empty cells) to `keys`, whose rows MUST
    * be distinct — the fan-out re-collapses by grouping on every caller
    * column, so duplicate rows would silently merge. `depth`/`width` must
    * match the [[build]] call. The sketch is broadcast — `keys` streams
    * through map-side, no corpus shuffle. Internals ride `cm_`-prefixed
    * columns (the sketch's own j/cell/s are aliased on the way in), so
    * caller columns named j/cell/s are safe; `cm_*`/`est` are reserved. */
  def probe(keys: DataFrame, id: Column, sketch: DataFrame,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val out = keys.columns.toIndexedSeq.map(col)
    val cells = sketch.select(col("j").as("cm_j"), col("cell").as("cm_cell"),
      col("s").as("cm_s"))
    keys.withColumn("cm_id", id)
      .crossJoin(AffineHash.rows(keys, depth, "cm_j"))
      .withColumn("cm_cell", AffineHash.slot(col("cm_j"), col("cm_id"), width))
      .join(broadcast(cells), Seq("cm_j", "cm_cell"), "left")
      .groupBy(out: _*)
      .agg(min(coalesce(col("cm_s"), lit(0L))).as("est"))
  }
}
