package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

/** The custom codegen'd DotProduct expression: numerically identical to the
  * declarative zip_with/aggregate formulation (same left-to-right summation
  * order), null-safe, and actually compiled (not CodegenFallback).
  */
class ExpressionSpec extends SparkSpec {

  test("graft_dot ≡ aggregate(zip_with(·,·,*)) bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val v = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val both = v.crossJoin(v.filter(col("vec_id") === 0).select(col("e").as("q")))
      .select(
        call_function("graft_dot", col("e"), col("q")).as("fast"),
        aggregate(zip_with(col("e"), col("q"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("slow"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1), "summation order must match"))
  }

  test("graft_dot null semantics and interpreted path") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_dot(cast(null as array<double>), array(1.0d)) AS n""".stripMargin)
      .collect()
    assert(rows.head.getDouble(0) == 11.0)
    assert(rows.head.isNullAt(1))
  }

  test("GraftExtensions injects graft_dot via SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expressions.GraftExtensions().apply(ext) // must not throw
    // runtime resolution via the registry path is covered by the tests above
  }

  test("graft_dot runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val v = Tables.load(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
      .select(call_function("graft_dot", col("e"), col("e")).as("d"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan.take(500))
    // and the value is right
    assert(v.agg(min("d")).head().getDouble(0) > 0.0)
  }
}
