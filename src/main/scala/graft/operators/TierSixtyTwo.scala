package graft.operators

import graft.{Q, Tables}
import graft.functions.Bloom
import graft.sources.Warehouse
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 62 (round 11, eleventh wave): two data-skipping scale techniques
  * promoted to declared, oracle-checked operators — the write-time
  * multi-dimensional layout and the runtime semi-join filter.
  *
  *  - q207: Z-ORDER GRID SCAN — the lakehouse multi-dimensional
  *    clustering pattern (Delta/Iceberg `ZORDER BY`, the grid-file of
  *    Nievergelt et al. 1984): lineitem laid out once into an 8×8 grid
  *    over (ship-day, partkey) with the cell id MORTON-interleaved from
  *    the top [[GridBits]] bits of each dimension, written hive-
  *    partitioned by cell ([[TierNine.ivfIndex]]'s write-time-layout
  *    convention, relational edition). A 2-D range box then reads ONLY
  *    the intersecting cells — a PARTITION filter, so both dimensions
  *    skip I/O where a 1-D sort key can skip only one — with the exact
  *    residual predicate behind the pruned scan (box ⊆ cell union, so
  *    pruning can never drop a row). The box is data-relative (second
  *    quarter of each dimension's span) so every SF exercises it.
  *  - q208: BLOOM-REDUCED DIMENSION JOIN — the semi-join reduction /
  *    runtime-filter pattern as a first-class operator: a selective
  *    dim (orders > 450000.00 total, ~10 % — too WIDE to broadcast at
  *    scale while its KEY bloom is KBs) builds a 16 Kib packed bloom
  *    ([[Bloom.toBits]], 3 hashes, ~1.4 % FP at 1 493 keys); the fact
  *    prefilters on the pure-codegen [[Bloom.mightContainCol]] BEFORE
  *    the shuffle join, cutting shuffle volume ~10× with the exact
  *    join behind it absorbing false positives. Result ≡ the plain
  *    join bit for bit (that IS the oracle); the reduction and the
  *    never-false-negative law are spec-pinned.
  *
  * Scale: q207's store build is one scan + one hive-partitioned write
  * (the bounds ride a broadcast 1-row frame — no driver read on the
  * build path; the probe's meta read is a bounded 1-row driver read,
  * q184 convention); the probe enumerates ≤ 64 cell ids driver-side and
  * Spark prunes directories before any file is opened. At 100 TB the
  * grid deepens ([[GridBits]] per dimension is the knob), bounds come
  * from the ingest manifest, and the Morton linearization keeps a cell-
  * id RANGE covering a compact rectangle — so a range-partitioned write
  * clusters neighboring cells into the same files. q208's bloom words
  * collapse at plan build (metadata-scale) and the membership test
  * stays inside whole-stage codegen; at 100 TB this is exactly Spark's
  * own runtime-filter rewrite, made explicit and available where the
  * optimizer can't see the selectivity.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star scale ops.
  */
object TierSixtyTwo {

  /** Grid resolution: bits per dimension (8×8 = 64 cells). */
  private[graft] val GridBits = 3
  private[graft] val GridSide = 1 << GridBits

  private val DimThreshold = 450000.0 // o_totalprice cut: ~10 % of orders
  private val BloomBits = 16384
  private val BloomHashes = 3

  /** Morton (Z-order) interleave of two [[GridBits]]-bit cell
    * coordinates — bit i of cx lands at position 2i, bit i of cy at
    * 2i+1. Pure bitwise column ops, stays in whole-stage codegen. */
  private[graft] def mortonCol(cx: Column, cy: Column): Column =
    (0 until GridBits).map { i =>
      shiftleft(cx.bitwiseAND(lit(1 << i)), i)
        .bitwiseOR(shiftleft(cy.bitwiseAND(lit(1 << i)), i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scala mirror of [[mortonCol]] for driver-side cell enumeration. */
  private[graft] def mortonInt(cx: Int, cy: Int): Int =
    (0 until GridBits).map { i =>
      ((cx & (1 << i)) << i) | ((cy & (1 << i)) << (i + 1))
    }.reduce(_ | _)

  /** The projected lineitem frame the grid stores: integer ship-day,
    * partkey, cents. */
  private def liOf(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select(
      expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("shipday"),
      col("l_partkey"),
      floor(col("l_extendedprice") * 100).cast("long").as("cents"))

  /** Build the Z-order grid store: `path/meta` holds the 1-row bounds
    * frame (the frozen quantizer of this layout — IvfStore centroid
    * convention), `path/grid` the rows hive-partitioned by Morton cell.
    * Bounds ride a broadcast 1-row crossJoin on the build path — fully
    * declarative, no driver read. */
  private[graft] def zorderStore(s: SparkSession, dir: String): String = {
    val path = Warehouse.scratchDir("graft_zorder")
    val li = liOf(s, dir)
    li.agg(min("shipday").as("mind"), max("shipday").as("maxd"),
        min("l_partkey").as("minp"), max("l_partkey").as("maxp"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val m = s.read.parquet(s"$path/meta")
    val withCell = li.crossJoin(broadcast(m))
      .withColumn("cell",
        mortonCol(expr(s"CAST((shipday - mind) * $GridSide div (maxd - mind + 1) AS INT)"),
          expr(s"CAST((l_partkey - minp) * $GridSide div (maxp - minp + 1) AS INT)")))
      .select("shipday", "l_partkey", "cents", "cell")
    Warehouse.writePartitioned(withCell, s"$path/grid", "cell")
    path
  }

  /** The second-quarter range box of each dimension, derived from the
    * store's frozen bounds (bounded 1-row driver read). */
  private[graft] def boxOf(s: SparkSession, path: String): (Long, Long, Long, Long) = {
    val m = s.read.parquet(s"$path/meta").collect()(0)
    val (mind, maxd) = (m.getLong(0), m.getLong(1))
    val (minp, maxp) = (m.getLong(2), m.getLong(3))
    (mind + (maxd - mind) / 4, mind + (maxd - mind) / 2,
      minp + (maxp - minp) / 4, minp + (maxp - minp) / 2)
  }

  /** Partition-pruned 2-D range scan: enumerate the ≤ [[GridSide]]²
    * Morton cells the box intersects (driver-side, bounded), prune the
    * store to those directories, then apply the exact residual box
    * predicate. Pruning is sound because a row's cell is a function of
    * its coordinates: box ⊆ union of intersecting cells. */
  private[graft] def zorderProbe(s: SparkSession, path: String): DataFrame = {
    val m = s.read.parquet(s"$path/meta").collect()(0)
    val (mind, maxd) = (m.getLong(0), m.getLong(1))
    val (minp, maxp) = (m.getLong(2), m.getLong(3))
    val (d1, d2, p1, p2) = boxOf(s, path)
    def cxOf(d: Long) = ((d - mind) * GridSide / (maxd - mind + 1)).toInt
    def cyOf(p: Long) = ((p - minp) * GridSide / (maxp - minp + 1)).toInt
    val cells = for {
      cx <- cxOf(d1) to cxOf(d2)
      cy <- cyOf(p1) to cyOf(p2)
    } yield mortonInt(cx, cy)
    s.read.parquet(s"$path/grid")
      .filter(col("cell").isin(cells: _*))
      .filter(col("shipday").between(d1, d2) &&
        col("l_partkey").between(p1, p2))
  }

  val q207 = Q("q207_zorder_scan",
    """WITH li AS (
      |  SELECT epoch_us(l_shipdate) // 86400000000 AS shipday, l_partkey,
      |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |b AS (SELECT min(shipday) AS mind, max(shipday) AS maxd,
      |             min(l_partkey) AS minp, max(l_partkey) AS maxp FROM li)
      |SELECT CAST(shipday AS BIGINT) AS shipday,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(cents) AS BIGINT) AS revenue_c
      |FROM li CROSS JOIN b
      |WHERE shipday BETWEEN mind + (maxd - mind) // 4
      |                  AND mind + (maxd - mind) // 2
      |  AND l_partkey BETWEEN minp + (maxp - minp) // 4
      |                    AND minp + (maxp - minp) // 2
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    // unique store per run (q80 convention), swept at JVM exit
    val path = zorderStore(s, dir)
    zorderProbe(s, path)
      .groupBy("shipday")
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_c"))
      .orderBy("shipday")
  }

  /** The bloom-prefiltered fact frame — exposed so the spec can pin the
    * reduction and the never-false-negative law. */
  private[graft] def bloomPrefiltered(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val lineitem = Tables.load(s, dir, "lineitem")
    val dim = orders.filter(col("o_totalprice") > DimThreshold)
    val words = Bloom.toBits(
      Bloom.build(dim.select("o_orderkey"), col("o_orderkey"),
        BloomBits, BloomHashes), BloomBits)
    lineitem.filter(
      Bloom.mightContainCol(words, col("l_orderkey"), BloomBits, BloomHashes))
  }

  val q208 = Q("q208_bloom_join",
    s"""SELECT o.o_orderpriority,
       |       CAST(count(*) AS BIGINT) AS n_items,
       |       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
       |         AS revenue_c
       |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
       |WHERE o.o_totalprice > $DimThreshold
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val dim = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > DimThreshold)
    bloomPrefiltered(s, dir)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("revenue_c"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(q207, q208)
}
