package graft

import graft.operators.{IvfStore, TierNine}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The appendable IVF store: growing the store incrementally against the
  * frozen quantizer must be indistinguishable from building it in one
  * shot, probes must prune to the probed cell's partition, replayed
  * batches must skip, and compaction must move bytes without moving a
  * single scored bit.
  */
class IvfStoreSpec extends SparkSpec {

  private def emb = TierNine.embOf(spark, sf)
  private def cents = TierNine.lloydCentroids(spark, sf)

  private def top(path: String, q: Seq[Double], nprobe: Int = 1): Seq[(Long, Double)] =
    IvfStore.probe(spark, path, q, k = 10, nprobe = nprobe, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def q0: Seq[Double] =
    emb.filter(col("vec_id") === 0).head.getSeq[Double](1).toSeq

  test("append ≡ one-shot build under the same frozen quantizer, bit for bit") {
    val inc = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    IvfStore.build(spark, emb.filter(col("vec_id") % 3 === 0), inc, cents)
    IvfStore.append(spark, inc, emb.filter(col("vec_id") % 3 === 1), batchId = Some(0L))
    IvfStore.append(spark, inc, emb.filter(col("vec_id") % 3 === 2), batchId = Some(1L))
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString
    IvfStore.build(spark, emb, full, cents)
    val query = q0
    assert(top(inc, query) == top(full, query))
    assert(top(inc, query, nprobe = 2) == top(full, query, nprobe = 2),
      "multi-probe must widen identically on both stores")
    // the appended vectors are actually served: some % 3 != 0 id appears
    // somewhere in the incremental store
    val appended = spark.read.parquet(s"$inc/vectors")
      .filter(col("vec_id") % 3 =!= 0).limit(1).count()
    assert(appended == 1L, "appended vectors must be visible to probes")
  }

  test("at-least-once replay skips; a second ingest stream's batch 0 absorbs") {
    val p = java.nio.file.Files.createTempDirectory("ivf_replay").toString
    IvfStore.build(spark, emb.filter(col("vec_id") % 3 === 0), p, cents)
    IvfStore.append(spark, p, emb.filter(col("vec_id") % 3 === 1), batchId = Some(0L))
    val query = q0
    val before = top(p, query)
    val rows = spark.read.parquet(s"$p/vectors").count()
    // replay the absorbed batch id — must skip, not double-serve
    IvfStore.append(spark, p, emb.filter(col("vec_id") % 3 === 1), batchId = Some(0L))
    assert(spark.read.parquet(s"$p/vectors").count() == rows,
      "replayed batch must not append")
    assert(top(p, query) == before)
    // a DIFFERENT stream's batch 0 must absorb (the ingestId namespace)
    IvfStore.append(spark, p, emb.filter(col("vec_id") % 3 === 2),
      batchId = Some(0L), ingestId = "stream2")
    val full = java.nio.file.Files.createTempDirectory("ivf_replay_full").toString
    IvfStore.build(spark, emb, full, cents)
    assert(top(p, query) == top(full, query))
  }

  test("probe plan: static partition filter, reads only the probed cell's files") {
    val p = java.nio.file.Files.createTempDirectory("ivf_prune").toString
    IvfStore.build(spark, emb.filter(col("vec_id") % 3 === 0), p, cents)
    IvfStore.append(spark, p, emb.filter(col("vec_id") % 3 =!= 0), batchId = Some(0L))
    val probed = IvfStore.probe(spark, p, q0, k = 10, excludeId = Some(0L))
    probed.collect() // execute so the scan's pruning metrics populate
    val scan = probed.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("cell"),
      scan.metadata.toString.take(600))
    val total = spark.read.parquet(s"$p/vectors").inputFiles.length
    val read = scan.metrics("numFiles").value
    assert(read < total,
      s"probe must prune to the probed cell: read $read of $total files")
    // build wrote one file per cell; the append added at most one more to
    // the probed cell — the scan reads ≤ 2 files however big the store is
    assert(read <= 2, s"expected ≤2 files for one cell (build + 1 append), read $read")
  }

  test("compact: files collapse to one per cell, probe and ledger bit-identical, replay intact") {
    val p = java.nio.file.Files.createTempDirectory("ivf_cpt").toString
    IvfStore.build(spark, emb.filter(col("vec_id") % 5 === 0), p, cents)
    for (r <- 1 until 5)
      IvfStore.append(spark, p, emb.filter(col("vec_id") % 5 === r),
        batchId = Some(r.toLong))
    val query = q0
    val before = top(p, query)
    val vecsBefore = spark.read.parquet(s"$p/vectors")
      .collect().map(_.toString).sorted.toSeq
    val ledgerBefore = spark.read.parquet(s"$p/ledger")
      .collect().map(_.toString).sorted.toSeq
    val filesBefore = spark.read.parquet(s"$p/vectors").inputFiles.length
    val nCells = cents.count()
    assert(filesBefore > nCells, "fixture invariant: appends must fragment the cells")
    // below threshold: the maintenance call is a no-op file listing
    assert(!IvfStore.compact(spark, p, maxFilesPerCell = 1000000))
    assert(IvfStore.compact(spark, p, maxFilesPerCell = 0))
    val filesAfter = spark.read.parquet(s"$p/vectors").inputFiles.length
    assert(filesAfter <= nCells && filesAfter < filesBefore,
      s"expected ≤$nCells files (one per cell), got $filesAfter (was $filesBefore)")
    assert(spark.read.parquet(s"$p/vectors").collect().map(_.toString).sorted.toSeq
      == vecsBefore, "compaction moves bytes, never rows")
    assert(spark.read.parquet(s"$p/ledger").inputFiles.length == 1,
      "the ledger must fold to a single file")
    assert(spark.read.parquet(s"$p/ledger").collect().map(_.toString).sorted.toSeq
      == ledgerBefore, "folding must preserve every absorbed (ingest_id, batch_id)")
    assert(top(p, query) == before, "probe must be bit-identical across compact")
    // the folded ledger is still the replay record
    IvfStore.append(spark, p, emb.filter(col("vec_id") % 5 === 2), batchId = Some(2L))
    assert(top(p, query) == before, "replay guard must survive the ledger fold")
  }

  test("s27: streaming ingest (foreachBatch append) — final probe ≡ one-shot build") {
    // the vector-store twin of LexIndex s25 / SigIndex s18: embeddings
    // arriving as micro-batches absorb via IvfStore.append against the
    // frozen quantizer; after the stream drains, a probe must equal a
    // from-scratch build over everything, and an epoch-replayed final
    // batch must be skipped by the ledger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inc = java.nio.file.Files.createTempDirectory("ivf_s27").toString
    IvfStore.build(spark, emb.filter(col("vec_id") % 3 === 0), inc, cents)
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val chunks = rest.grouped(math.max(1, (rest.length + 2) / 3)).toSeq
    assert(chunks.length >= 2, "fixture must yield multiple micro-batches")
    val in = MemoryStream[(Long, Seq[Double])]
    var lastBatch: Option[(Long, Seq[(Long, Seq[Double])])] = None
    val q = in.toDF().toDF("vec_id", "e").writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        lastBatch = Some(id -> b.collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq)
        IvfStore.append(spark, inc, b, batchId = Some(id))
      }.start()
    try chunks.foreach { c => in.addData(c); q.processAllAvailable() }
    finally q.stop()
    val full = java.nio.file.Files.createTempDirectory("ivf_s27_full").toString
    IvfStore.build(spark, emb, full, cents)
    assert(top(inc, q0) == top(full, q0),
      "streamed store must probe identically to a one-shot build")
    val (id, rows2) = lastBatch.get
    IvfStore.append(spark, inc, rows2.toDF("vec_id", "e"), batchId = Some(id))
    assert(top(inc, q0) == top(full, q0),
      "replayed batch must be skipped, not double-ingested")
  }
}
