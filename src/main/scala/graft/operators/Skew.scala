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
    * with the first phase salted `salts` ways. The salt is derived from a
    * hash of the whole row's value column (deterministic, no rand() — keeps
    * retries/speculative tasks consistent).
    */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column, salts: Int): DataFrame = {
    val salted = df.groupBy(key.as("k"), (pmod(hash(valueCol), lit(salts))).as("salt"))
      .agg(sum(valueCol).as("partial"))
    salted.groupBy(col("k")).agg(sum(col("partial")).as("total"))
  }
}
