package graft

import graft.operators.TierSixtyTwo
import org.apache.spark.sql.functions._

/** Tier-62 differentials: q207's Z-order grid laws — Morton bijectivity,
  * pruned probe ≡ direct box filter (soundness: pruning never drops a
  * row), and a genuine file-level pruning gate — and q208's bloom
  * prefilter laws — never-false-negative, real reduction, bloom-join ≡
  * plain-join bit for bit.
  */
class TierSixtyTwoSpec extends SparkSpec {

  test("morton interleave is a bijection on the grid") {
    val side = TierSixtyTwo.GridSide
    val codes = for (cx <- 0 until side; cy <- 0 until side)
      yield TierSixtyTwo.mortonInt(cx, cy)
    assert(codes.distinct.size == side * side, "morton must be injective")
    assert(codes.min == 0 && codes.max == side * side - 1,
      "morton must cover exactly 0 until side²")
    // locality sanity: adjacent cells in x differ only in interleaved x bits
    assert(TierSixtyTwo.mortonInt(1, 0) == 1 && TierSixtyTwo.mortonInt(0, 1) == 2)
  }

  test("q207 pruned probe ≡ direct box filter; pruning is real") {
    val path = TierSixtyTwo.zorderStore(spark, sf)
    val (d1, d2, p1, p2) = TierSixtyTwo.boxOf(spark, path)

    val probed = TierSixtyTwo.zorderProbe(spark, path)
      .select("shipday", "l_partkey", "cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val direct = Tables.load(spark, sf, "lineitem").select(
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
          .as("shipday"),
        col("l_partkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      .filter(col("shipday").between(d1, d2) &&
        col("l_partkey").between(p1, p2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(probed == direct,
      s"pruned scan must equal the direct filter (${probed.size}/${direct.size})")
    assert(probed.nonEmpty, "box must be non-degenerate at spec SF")

    // the grid populates many cells and the probe reads strictly fewer
    val store = spark.read.parquet(s"$path/grid")
    val totalCells = store.select("cell").distinct().count()
    val probedCells = TierSixtyTwo.zorderProbe(spark, path)
      .select("cell").distinct().count()
    assert(totalCells > 16, s"fixture must populate the grid ($totalCells cells)")
    assert(probedCells * 3 <= totalCells,
      s"probe must prune most cells (read $probedCells of $totalCells)")
    // file-level gate: the pruned scan opens fewer files than the store has
    val totalFiles = store.select(input_file_name()).distinct().count()
    val probedFiles = TierSixtyTwo.zorderProbe(spark, path)
      .select(input_file_name()).distinct().count()
    assert(probedFiles < totalFiles,
      s"partition pruning must skip files ($probedFiles of $totalFiles)")
  }

  test("q208 bloom prefilter: superset of true matches, real reduction, join ≡ plain") {
    val lineitem = Tables.load(spark, sf, "lineitem")
    val dimKeys = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 450000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(dimKeys.nonEmpty, "dim cut must select some orders")

    val pre = TierSixtyTwo.bloomPrefiltered(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
    // never-false-negative: every lineitem of a dim order survives
    val trueMatches = lineitem.select("l_orderkey").collect()
      .map(_.getLong(0)).filter(dimKeys)
    assert(trueMatches.forall(k => pre.contains(k)),
      "bloom prefilter dropped a true match (false negative)")
    assert(pre.count(dimKeys) == trueMatches.length,
      "prefilter must keep every true-match row")
    // real reduction: the prefilter passes far fewer rows than the scan
    val total = lineitem.count()
    assert(pre.length < total / 2,
      s"prefilter should cut the fact scan (kept ${pre.length} of $total)")

    // bloom-join ≡ plain join, bit for bit (FPs absorbed by the exact join)
    val got = TierSixtyTwo.q208.run(spark, sf).collect().map(_.toSeq).toSeq
    val dim = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 450000.0)
    val want = lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("revenue_c"))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(got == want, "bloom-reduced join must equal the plain join")
  }
}
