package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §2.2 "Partitioning & shuffle").
  *
  * Spark's AQE already splits skewed JOIN partitions at runtime; what it
  * cannot fix is a skewed AGGREGATION key (one group = one reducer task).
  * [[saltedAgg]] is the standard two-phase rewrite: spray each group over
  * `salts` sub-keys (partial aggregate runs `salts`-way parallel), then
  * merge the sub-aggregates — associative aggregates only, same result by
  * construction. At 100 TB this is the difference between a hot key pinning
  * one executor for hours and an even spread.
  */
object Skew {

  /** Two-phase salted aggregation: `df.groupBy(key).agg(sum(valueCol))`
    * with the first phase salted `salts` ways. The salt is the input
    * partition id (mod `salts`): deterministic under task retry/speculation
    * (a re-run task re-reads the same partition), and — unlike hashing the
    * VALUE column — it still fans out a hot key whose rows all carry one
    * constant value (the common skew shape, e.g. a counter). Caveat: a hot
    * key concentrated in a single INPUT partition stays on one salt;
    * repartition the input first if the source isn't already spread.
    */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column, salts: Int): DataFrame = {
    val salted = df.groupBy(key.as("k"), pmod(spark_partition_id(), lit(salts)).as("salt"))
      .agg(sum(valueCol).as("partial"))
    salted.groupBy(col("k")).agg(sum(col("partial")).as("total"))
  }

  /** Salted within-key co-occurrence SELF-JOIN: every ordered pair of
    * distinct `item`s sharing a `key` — `(k, ia, ib)` with ia ≠ ib — the
    * co-purchase / co-click / co-citation expansion (q154/q182's shape).
    *
    * The naive `df ⋈ df ON key` puts a whale key's d² pair rows in ONE
    * join task; AQE's skew split only helps sort-merge INPUT sizes, not
    * a single key's quadratic OUTPUT. Standard salt rewrite: the left
    * leg gets one deterministic salt per row (`hash(item) mod salts` —
    * retry-stable, and spreads a whale key's items regardless of input
    * layout), the right leg replicates each row to ALL salts, the join
    * key becomes `(key, salt)` — each (a, b) pair meets exactly once
    * (at a's salt), so the result is identical by construction while the
    * whale's d² rows spread `salts`-way. Cost: the replicated leg
    * shuffles `salts`× rows — cheap for the distinct (key, item) frames
    * this serves; pick `salts` ≈ the skew factor to flatten, not the
    * cluster width.
    */
  def saltedCoPairs(df: DataFrame, key: Column, item: Column,
      salts: Int = 8): DataFrame = {
    val a = df.select(key.as("k"), item.as("ia"),
      pmod(xxhash64(item), lit(salts.toLong)).as("salt"))
    val b = df.select(key.as("k"), item.as("ib"))
      .withColumn("salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    a.join(b, Seq("k", "salt"))
      .filter(col("ia") =!= col("ib"))
      .select(col("k"), col("ia"), col("ib"))
  }

  /** [[saltedCoPairs]] restricted to UNORDERED pairs — `ia < ib` only,
    * half the rows. When the downstream per-pair aggregate is symmetric
    * (a shared-count is the same in both directions — q154/q146/q182),
    * aggregate the half and mirror the AGGREGATED frame (pair-count-sized)
    * instead of feeding both directions (Σd²-sized) through the
    * aggregation: same result, half the aggregation input (guide §2
    * "shuffle fewer bytes"). Identical to
    * `saltedCoPairs(df, key, item, salts).filter(ia < ib)` by
    * construction (ScaleTechniqueSpec pins the equality).
    */
  def saltedCoPairsHalf(df: DataFrame, key: Column, item: Column,
      salts: Int = 8): DataFrame =
    saltedCoPairs(df, key, item, salts).filter(col("ia") < col("ib"))

  /** The skew DIAGNOSTIC behind the salting decisions (q202's library
    * face): one row of shuffle-planning facts for `df` keyed by `key` —
    * `(n_keys, total_rows, max_cnt, mean_cnt, max_mean_ppm, top1_ppm,
    * top10_ppm, p99_cnt)`, all exact integers. Every stage is
    * partial+final: per-key counts, one 3-scalar agg, the top-10 via
    * `limit` (TakeOrderedAndProject — never a global sort), the exact
    * p99 per-key count via count-of-counts + [[Cumulative.runningSum]]
    * (never a per-key window). Collapses to eight scalars driver-side
    * (bounded reads), so the per-key frame is read three times — cheap
    * lineage (scan + one partial agg); persist it upstream if the
    * source scan is the cost. */
  def report(df: DataFrame, key: Column): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val k = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val st = k.agg(count(lit(1)).as("nk"), sum("cnt").as("tot"),
      max("cnt").as("mx")).collect().head
    val (nk, tot, mx) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val s10 = k.orderBy(col("cnt").desc, col("key")).limit(10)
      .agg(sum("cnt")).collect().head.getLong(0)
    val cc = k.groupBy("cnt").agg(count(lit(1)).as("freq"))
    val p99 = Cumulative.runningSum(s, cc, Seq(col("cnt")), col("freq"), "cum")
      .filter(col("cum") >= (99L * nk + 99L) / 100L)
      .agg(min("cnt")).collect().head.getLong(0)
    // ppm products in BigInt (oracle side HUGEINT): no Int64 envelope
    def ppm(num: BigInt): Long = (num * 1000000 / tot).toLong
    Seq((nk, tot, mx, tot / nk, ppm(BigInt(mx) * nk), ppm(BigInt(mx)),
      ppm(BigInt(s10)), p99))
      .toDF("n_keys", "total_rows", "max_cnt", "mean_cnt", "max_mean_ppm",
        "top1_ppm", "top10_ppm", "p99_cnt")
  }
}
