package graft.tools

import graft.{Engine, Tables}
import graft.operators.{SigIndex, TextOps}
import org.apache.spark.sql.functions._

/** Throwaway r15 probe: how many files does a SigIndex build leave per
  * table at sf0.1, and what does the build+probe cost? */
object FileCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.localSession("graft-filecount")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val name = SigIndex.scratchName(spark, "sigidx_fc")
    val t0 = System.nanoTime()
    SigIndex.build(docs.filter(col("doc_id") % 5 =!= 0), name)
    println(f"[fc] build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Seq("postings", "vocab").foreach { t =>
      println(s"[fc] ${t}: ${spark.table(s"${name}_$t").inputFiles.length} files")
    }
    val t1 = System.nanoTime()
    SigIndex.probe(spark, name, docs.filter(col("doc_id") % 5 === 0))
      .write.format("noop").mode("overwrite").save()
    println(f"[fc] probe ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
