package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter as a build-once / probe-many pair over BIGINT keys — the
  * constant-size membership screen a pipeline puts in front of expensive
  * joins: a removal/allow list from an earlier stage (dedup drop list,
  * contamination blocklist, previously-processed ids) compressed to
  * `bits` bits and BROADCAST, so membership tests are a map-side join at
  * any corpus scale — the corpus never shuffles. One-sided error only:
  * no false negatives ever; false positives at the classic
  * (1−e^(−kn/m))^k rate, so "maybe" hits feed an exact verification or
  * an acceptable over-drop. [[graft.operators.TierSeven.q56]] is the
  * DuckDB-checked anchor.
  *
  * Determinism: the filter is the SET of set bit positions (a distinct
  * projection — order-independent, exactly reproducible) and positions
  * come from the engine's affine-modular hash family over BIGINT ids
  * (`id mod P` before the multiply — the same Int64-wrap guard as
  * [[CountMin]]), never an engine-native hash.
  */
object Bloom {

  /** Hash row j's bit position for key `id` — the shared [[AffineHash]]
    * family (pmod keeps negative BIGINT ids in range; nonnegative ids
    * match q56's plain-`%` oracle SQL bit-for-bit). */
  private def pos(j: Column, id: Column, bits: Int): Column =
    AffineHash.slot(j, id, bits)

  /** Build the filter from `keys`: one `bf_pos BIGINT` row per set bit
    * (≤ `bits` rows however many keys go in). */
  def build(keys: DataFrame, id: Column, bits: Int = 512, hashes: Int = 3): DataFrame =
    keys.select(id.as("bf_id"))
      .crossJoin(AffineHash.rows(keys, hashes, "bf_j"))
      .select(pos(col("bf_j"), col("bf_id"), bits).as("bf_pos"))
      .distinct()

  /** Merge two filters built with the SAME (bits, hashes): the filter is a
    * bit SET, so the merge is set union and `union(build(A), build(B)) ≡
    * build(A ∪ B)` EXACTLY (SketchSpec pins the law) — build blocklists per
    * partition/source, union the ≤`bits`-row tables, screen once. The
    * packed-word form merges as bitwise OR ([[unionBits]]). */
  def union(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).distinct()

  /** [[union]] over [[toBits]]-packed filters: word-wise OR. */
  def unionBits(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, s"word counts differ: ${a.length} vs ${b.length}")
    a.zip(b).map { case (x, y) => x | y }
  }

  /** Pack the filter into `bits/64` longs — ≤ `bits` rows collected, which
    * is metadata-scale BY CONSTRUCTION however many keys were built in
    * (that bound is the whole point of a Bloom filter). */
  def toBits(filter: DataFrame, bits: Int = 512): Array[Long] = {
    val words = new Array[Long]((bits + 63) / 64)
    filter.collect().foreach { r =>
      val p = r.getLong(0)
      words((p / 64).toInt) |= 1L << (p % 64).toInt
    }
    words
  }

  /** Membership test as a pure Column over a [[toBits]]-packed filter —
    * no join, no aggregation: stays inside whole-stage codegen and
    * composes STATELESSLY with Structured Streaming (the DataFrame-based
    * [[mightContain]] re-collapses a fan-out with a groupBy, which a
    * stream would treat as stateful aggregation). Same hash family, same
    * guarantee: never false for a built key. */
  def mightContainCol(words: Array[Long], id: Column, bits: Int = 512,
      hashes: Int = 3): Column =
    mightContainCol(array(words.map(lit(_)): _*), id, bits, hashes)

  /** [[mightContainCol]] with the packed words as a COLUMN (`ARRAY<BIGINT>`,
    * `bits/64` elements) instead of a Scala literal — the form the SQL
    * surface registers as `graft_bloom_maybe(words, id[, bits, hashes])`:
    * the filter can come from any expression (a literal, a broadcast-joined
    * one-row table, a per-group filter column), and the test is the same
    * pure codegen'd composition. */
  def mightContainCol(packed: Column, id: Column, bits: Int,
      hashes: Int): Column =
    (0 until hashes).map { j =>
      val p = pos(lit(j.toLong), id, bits)
      call_function("shiftrightunsigned",
        element_at(packed, (p / 64).cast("int") + 1), (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Append `maybe BOOLEAN` to `df`: true iff every hash position of `id`
    * is set in `filter` — guaranteed true for every key the filter was
    * built from. `bits`/`hashes` must match the [[build]] call.
    *
    * Implemented over the packed form: the filter collapses to `bits/64`
    * long literals (one metadata-scale collect at plan build — ≤ `bits`
    * rows by construction) and the test is a pure codegen'd Column.
    * `df` never shuffles, rows pass through 1:1 (duplicates included),
    * and the same plan runs in batch or streaming. An earlier join-based
    * form fanned every row ×`hashes` and re-collapsed with a groupBy —
    * a full-corpus shuffle per probe, and duplicate input rows silently
    * merged (SketchSpec pins this form identical on every probe).
    *
    * Each call collects `filter` once at plan build — screening MANY
    * frames against one blocklist should either persist `filter` first
    * or call [[toBits]] once and reuse [[mightContainCol]] directly, so
    * the blocklist's build lineage doesn't re-execute per probe. `maybe`
    * is reserved (an existing column would be replaced). */
  def mightContain(df: DataFrame, id: Column, filter: DataFrame,
      bits: Int = 512, hashes: Int = 3): DataFrame =
    df.withColumn("maybe", mightContainCol(toBits(filter, bits), id, bits, hashes))
}
