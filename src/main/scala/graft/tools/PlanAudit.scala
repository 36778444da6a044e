package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for declared queries so plan shapes
  * (pushed filters, pruned columns, partial+final aggregation, broadcast
  * joins, TakeOrderedAndProject) can be audited per round.
  *
  * Usage: `sbt "runMain graft.tools.PlanAudit [sfDir] [queryName...]"`
  * (no names → all declared queries). The load-bearing shape assertions are
  * ALSO pinned in [[graft.OperatorSpec]] so regressions fail `sbt test`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.declared
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"===== ${q.name}")
        q.run(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
