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
}
