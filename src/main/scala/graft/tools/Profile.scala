package graft.tools

import graft.{Engine, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Dev-loop profiler: `runMain graft.tools.Profile <sfDir> <query>` splits a
  * declared query's cold-cache cost into plan CONSTRUCTION (driver actions:
  * the adaptive v.count(), Cumulative's sample/offset jobs) and EXECUTION
  * (noop write of the full plan). Not part of the driver contract — a
  * diagnosis tool; pair with `SPARK_GRAFT_ONLY=…` on graft.Bench for
  * timed-pass comparisons.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val q = if (args.length > 1) args(1) else "q26_minhash_lsh"
    val spark = Engine.localSession("graft-profile")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm (construction + execution, untimed)
    noop(SparkEntry.queries(q)(spark, sfDir))
    spark.catalog.clearCache()
    val df = time(s"$q construct") { SparkEntry.queries(q)(spark, sfDir) }
    time(s"$q execute (noop)") { noop(df) }
    spark.catalog.clearCache()
    val df2 = time(s"$q construct (2nd)") { SparkEntry.queries(q)(spark, sfDir) }
    println(s"[profile] rows = ${time(s"$q count") { df2.count() }}")
    spark.stop()
  }
}
