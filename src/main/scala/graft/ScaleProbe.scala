package graft

import graft.streaming.IngestPipeline
import org.apache.spark.sql.functions._

/** The IngestPipeline leg of the empirical scale probe (VERDICT r14
  * #1): build the frozen corpus artifacts over a documents table, then
  * drain a batch of fresh docs through the full admission pipeline
  * (quality → Bloom → SimHash → semantic → cluster maintenance) and
  * report build and per-batch wall times as one JSON line.
  *
  *   runMain graft.ScaleProbe <sfDir> [batchDocs]
  *
  * The incoming batch is synthesized deterministically from the corpus'
  * own vocabulary (token-suffixed so it is genuinely fresh — no RNG),
  * sized `batchDocs` (default 1000). The measurement of interest is the
  * SLOPE: per-batch cost at 1× vs 10× corpus — the design claim is that
  * stages 1–4 read only batch-proportional + cell-pruned data, so the
  * per-batch time should grow far slower than the corpus.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = Engine.localSession("graft-scaleprobe")
    val corpus = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val nCorpus = corpus.count()

    val store = java.nio.file.Files.createTempDirectory("probe_store").toString
    val out = java.nio.file.Files.createTempDirectory("probe_out").toString

    val t0 = System.nanoTime()
    val h = IngestPipeline.build(spark, corpus, store, out,
      emb => graft.operators.IvfStore.train(emb, k = 16), thr = 0.95)
    val tBuild = (System.nanoTime() - t0) / 1e9

    // fresh batches: corpus texts token-suffixed (never seen by any
    // stage); each batch gets fresh ids and a fresh suffix
    val nBatches = args.lift(2).map(_.toInt).getOrElse(2)
    val batch = corpus.limit(batchDocs)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => when(t === "", t).otherwise(concat(t, lit("_probe")))))
          .as("text"))
      .localCheckpoint(true) // freeze the input so the batch cost is pure pipeline

    val times = (1 to nBatches).map { i =>
      val bi = if (i == 1) batch
        else batch.select((col("doc_id") + lit(10000000L * i)).as("doc_id"),
          regexp_replace(col("text"), "_probe", s"_probe$i").as("text"))
          .localCheckpoint(true)
      val t1 = System.nanoTime()
      IngestPipeline.absorb(h, bi, batchId = Some(i.toLong))
      (System.nanoTime() - t1) / 1e9
    }
    val admitted = spark.read.parquet(s"$out/admitted").count()

    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val bt = times.zipWithIndex
      .map { case (t, i) => s""""batch${i + 1}_sec":$t""" }.mkString(",")
    println(s"""{"probe":"ingest_pipeline","sf":"$sfDir","corpus_docs":$nCorpus,"batch_docs":$batchDocs,"build_sec":$tBuild,$bt,"admitted":$admitted,"load1":$load}""")
    h.release()
    spark.stop()
  }
}
