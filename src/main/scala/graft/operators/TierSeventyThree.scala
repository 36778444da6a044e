package graft.operators

import graft.{Q, Tables}
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 73 (round 11, twenty-second wave): in-flight observed metrics
  * and the Pareto classification — the audit that rides the main job
  * for free, and the operational 80/20 cut.
  *
  *  - q227: OBSERVED WRITE AUDIT — the write-audit-publish pattern
  *    through Spark's native `Observation`/CollectMetrics operator
  *    (the one metrics surface the inventory lacked): the main job
  *    writes the projected fact shards to a store, and the audit row
  *    (row count, revenue total, null-key count, max ship-day) is
  *    OBSERVED on the same single pass — CollectMetrics taps the rows
  *    as they stream through the writer, so the audit costs ZERO extra
  *    scans (the q217 profile re-reads the table; this is the shape a
  *    production WAP gate actually deploys). The declared result is
  *    the observed audit row; the oracle recomputes the same
  *    aggregates directly — observed ≡ scanned is the whole claim.
  *  - q228: ABC / PARETO CLASSIFICATION — parts classed A/B/C by
  *    cumulative revenue share (A holds the first 70 % of revenue, B
  *    to 90 %, C the tail — the operational inventory-priority cut
  *    behind "which keys deserve a cache/salt/handling tier"). Ranks
  *    by (revenue DESC, partkey) through `Cumulative.runningSum` on
  *    the negated key — the two-pass distributed prefix, never a
  *    global window; class boundaries in exact cross-multiplied
  *    integers on the EXCLUSIVE prefix (the crossing part belongs to
  *    the class it completes, first part always A). Output: per-class
  *    part counts, revenue and exact-ppm share.
  *
  * Scale: q227's audit is free by construction (one pass, the metrics
  * fold map-side); q228 collapses to part-cardinality rows before the
  * two-pass prefix.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star warehouse
  * ops.
  */
object TierSeventyThree {

  /** The observed single-pass write: returns the audit row AFTER the
    * write action completes (Observation.get blocks on the action).
    * Exposed so the spec can pin CollectMetrics in the plan and the
    * constructed-nulls branch. */
  private[graft] def observedWrite(s: SparkSession, li: DataFrame,
      path: String): (Long, Long, Long, Long) = {
    val obs = Observation()
    val projected = li.select(col("l_orderkey"), col("l_partkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
          .as("shipday"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("cents")).as("revenue_c"),
        sum(when(col("l_partkey").isNull, 1L).otherwise(0L)).as("null_keys"),
        max(col("shipday")).as("max_shipday"))
    projected.write.mode("overwrite").parquet(path) // THE job; audit rides it
    val m = obs.get
    (m("n_rows").asInstanceOf[Long], m("revenue_c").asInstanceOf[Long],
      m("null_keys").asInstanceOf[Long], m("max_shipday").asInstanceOf[Long])
  }

  val q227 = Q("q227_observed_audit",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |         AS revenue_c,
      |       CAST(count(*) - count(l_partkey) AS BIGINT) AS null_keys,
      |       CAST(max(epoch_us(l_shipdate) // 86400000000) AS BIGINT)
      |         AS max_shipday
      |FROM lineitem""".stripMargin) { (s, dir) =>
    import s.implicits._
    val path = Warehouse.scratchDir("graft_wap") + "/shards"
    val row = observedWrite(s, Tables.load(s, dir, "lineitem"), path)
    Seq(row).toDF("n_rows", "revenue_c", "null_keys", "max_shipday")
  }

  val q228 = Q("q228_abc_pareto",
    """WITH pr AS (
      |  SELECT l_partkey,
      |         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS revenue_c
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(revenue_c) AS BIGINT) AS w FROM pr),
      |cum AS (
      |  SELECT l_partkey, revenue_c,
      |         CAST(sum(revenue_c) OVER (ORDER BY revenue_c DESC, l_partkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - revenue_c AS BIGINT) AS cum_excl
      |  FROM pr),
      |cls AS (
      |  SELECT CASE WHEN cum_excl * 10 < w * 7 THEN 'A'
      |              WHEN cum_excl * 10 < w * 9 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |         revenue_c
      |  FROM cum CROSS JOIN tot)
      |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST(sum(revenue_c) AS BIGINT) AS revenue_c,
      |       CAST(1000000 * sum(revenue_c) // (SELECT w FROM tot) AS BIGINT)
      |         AS share_ppm
      |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val pr = Tables.load(s, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("revenue_c"))
    val w = pr.agg(sum("revenue_c")).collect()(0).getLong(0) // bounded scalar
    val cum = Cumulative.runningSum(s,
        pr.withColumn("neg", -col("revenue_c")),
        Seq(col("neg"), col("l_partkey")), col("revenue_c"), "cum_incl")
      .withColumn("cum_excl", col("cum_incl") - col("revenue_c"))
    cum.withColumn("abc_class",
        when(col("cum_excl") * 10 < w * 7L, "A")
          .when(col("cum_excl") * 10 < w * 9L, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum("revenue_c").as("revenue_c"))
      .withColumn("share_ppm", expr(s"1000000 * revenue_c div ${w}L"))
      .orderBy("abc_class")
  }

  val all: Seq[Q] = Seq(q227, q228)
}
