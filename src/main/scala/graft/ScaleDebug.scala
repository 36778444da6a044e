package graft

import graft.operators.{Components, Dedup, TextOps, TierFour}
import org.apache.spark.sql.functions._

/** Stage-level timing for the 10× probe's super-linear entries (q104,
  * q114): times each pipeline piece in isolation so the blow-up is
  * attributable to a stage, not a query. One JSON line per timing.
  *
  *   runMain graft.ScaleDebug <sfDir>
  */
object ScaleDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/repo/scale/sf1")
    val spark = Engine.localSession("graft-scaledebug")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9},"rows":$n}""")
    }

    val docs = Tables.load(spark, sfDir, "documents")

    timed("exact_survivors") {
      Dedup.exactSurvivors(docs).count()
    }
    spark.catalog.clearCache()
    graft.operators.Cumulative.releaseAll()

    val distinctDocs = Dedup.exactSurvivors(docs).persist()
    timed("distinct_materialize") { distinctDocs.count() }

    timed("minhash_pairs") {
      TierFour.minhashPairs(TextOps.tokOf(distinctDocs.select("doc_id", "text")))
        .count()
    }
    spark.catalog.clearCache()
    graft.operators.Cumulative.releaseAll()
    distinctDocs.persist(); distinctDocs.count()

    var labeled: org.apache.spark.sql.DataFrame = null
    timed("clusters") {
      labeled = Dedup.clusters(distinctDocs).persist()
      labeled.count()
    }

    timed("q114_manifest_fold_from_labels") {
      val eMap = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      val eSurv = eMap.groupBy("h").agg(min("doc_id").as("e_surv"))
      val docToE = eMap.join(eSurv, "h").select("doc_id", "e_surv")
      docToE.join(labeled.withColumnRenamed("doc_id", "e_surv"), "e_surv")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          array_join(
            transform(array_sort(collect_list(col("doc_id"))), _.cast("string")),
            ",").as("members"))
        .count()
    }

    timed("q104_argmax_fold_from_labels") {
      val tokc = distinctDocs.select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
      labeled.join(tokc, "doc_id")
        .groupBy("cluster")
        .agg(max(struct(col("n_tokens"), col("doc_id"))).as("m"))
        .count()
    }
    spark.catalog.clearCache()
    graft.operators.Cumulative.releaseAll()

    timed("q114_full") {
      graft.operators.TierSixteen.q114.run(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    graft.operators.Cumulative.releaseAll()

    timed("q104_full") {
      graft.operators.TierFourteen.q104.run(spark, sfDir).count()
    }

    spark.stop()
  }
}
