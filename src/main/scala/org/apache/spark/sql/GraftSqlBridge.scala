package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan construction — the standard extension-
  * library escape hatch (Spark offers no public "DataFrame from custom
  * LogicalPlan" API; every Catalyst-extending library ships one of these).
  * Kept to the two one-liners the graft planner nodes need.
  */
object GraftSqlBridge {

  /** Wrap an analyzed/unanalyzed logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ Expression converters — what lets the engine register its
    * COLUMN-composed probes (Bloom membership, Count-Min estimate) as SQL
    * functions: a registry builder receives unresolved child Expressions,
    * wraps them as Columns, composes the probe with the ONE shared Scala
    * definition (no SQL-side reimplementation to drift), and unwraps the
    * result back to the Expression the analyzer resolves. */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    // the EAGER converter — ExpressionUtils.expression returns a lazy
    // ColumnNodeExpression placeholder that only the classic Dataset API
    // paths unwrap; an expression returned from a FunctionRegistry builder
    // goes straight into the analyzer, which would leave the placeholder
    // in the physical plan as an Unevaluable
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Imperative table-function registration (the `createOrReplaceTempFunction`
    * twin of `SparkSessionExtensions.injectTableFunction`) — SQL
    * `SELECT … FROM graft_xxx(…)` resolution for whole-plan operators. */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[catalyst.expressions.Expression] => LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** The analyzed logical plan beneath a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Strip the carried `originStats` off a checkpointed DataFrame's
    * LogicalRDD leaf. `localCheckpoint` truncates LINEAGE but preserves
    * the optimizer statistics of the plan it replaced — and size-in-bytes
    * estimates MULTIPLY across join children, so an iterative operator
    * that checkpoints a self-join every round compounds them: the BigInt
    * estimate's digit count grows geometrically and by ~round 10 the
    * driver is doing million-digit Toom-Cook multiplications inside
    * `SizeInBytesOnlyStatsPlanVisitor` (single-core, looks like a hang).
    * Dropping originStats resets the leaf to the configured default size
    * estimate, which is what a fresh scan of unknown data would get.
    * No-op for non-LogicalRDD plans.
    */
  def freshLeaf(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
    case lr: execution.LogicalRDD =>
      ofRows(df.sparkSession,
        lr.copy()(df.sparkSession.asInstanceOf[classic.SparkSession], None, None))
    case _ => df
  }

  /** Drop the executor blocks behind a localCheckpoint'd DataFrame.
    * `Dataset.unpersist` only touches the SQL cache manager — checkpoint
    * blocks are plain persisted RDDs in the block manager and otherwise
    * live until the session ends. The data is NOT recomputable afterwards
    * (lineage was truncated), so only call this on intermediates that
    * will never be read again. No-op for non-LogicalRDD plans. */
  def releaseLeaf(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false); ()
    case _ => ()
  }

  /** [[releaseLeaf]] for COMPOSED plans: drop the blocks behind every
    * LogicalRDD leaf anywhere in the plan tree — the release-handle shape
    * for library pipelines whose lineage bottoms out in localCheckpoint
    * leaves wrapped by further operators ([[graft.operators.Dedup]]'s
    * labels semi-join). Same finality contract as [[releaseLeaf]]: the
    * plan cannot be re-executed afterwards. */
  def releaseLeaves(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** The RDD ids behind a plan's LogicalRDD leaves — the exclusion set
    * for [[releaseLeavesExcept]]. */
  def leafIds(df: DataFrame): Set[Int] = {
    val b = Set.newBuilder[Int]
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => b += lr.rdd.id
      case _ => ()
    }
    b.result()
  }

  /** [[releaseLeaves]] that spares the leaves in `keep` — for composed
    * pipelines whose plan embeds a CALLER-OWNED checkpointed input (e.g.
    * [[graft.operators.Dedup.maintain]]'s labels frame in a chained
    * ingest loop): releasing the whole tree would destroy the caller's
    * frame (lineage truncated ⇒ unrecoverable). Capture the input's ids
    * with [[leafIds]] BEFORE building the composed plan, release with
    * this afterwards. */
  def releaseLeavesExcept(df: DataFrame, keep: Set[Int]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD if !keep(lr.rdd.id) =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
