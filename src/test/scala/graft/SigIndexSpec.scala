package graft

import graft.operators.{SigIndex, TextOps, TierFour}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** The persisted signature index (incremental dedup): probing a new batch
  * against the index must be (a) EXACT — build-time pairs ∪ probe pairs ≡
  * one full recompute over corpus ∪ batch in the frozen token space — and
  * (b) INCREMENTAL — the executed probe plan reads the corpus ONLY through
  * the bucketed postings table (no re-tokenization, no Exchange on the
  * index side of the bucket join).
  */
class SigIndexSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
  private def corpus = docs.filter(col("doc_id") % 5 =!= 0)
  private def batch = docs.filter(col("doc_id") % 5 === 0)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("probe ∪ corpus pairs ≡ full recompute over the union") {
    // precondition that makes frozen-vocab ranks == union-vocab ranks here
    // (the fixture's documents share one small vocabulary); genuinely-new
    // tokens are covered by the drop-semantics test below
    val unseen = TextOps.tokOf(batch).select("token").distinct()
      .join(TextOps.tokOf(corpus).select("token").distinct(), Seq("token"), "left_anti")
    assert(unseen.isEmpty, "fixture invariant: corpus covers the batch vocabulary")
    SigIndex.build(corpus, "sigidx_spec")
    val probe = pairSet(SigIndex.probe(spark, "sigidx_spec", batch))
    val corpusPairs = pairSet(TierFour.minhashPairs(TextOps.tokOf(corpus)))
    val full = pairSet(TierFour.minhashPairs(TextOps.tokOf(docs)))
    assert(probe.nonEmpty, "fixture must produce cross-batch near-dups")
    assert(probe.intersect(corpusPairs).isEmpty,
      "probe emits only pairs touching the batch")
    assert(probe.union(corpusPairs) == full,
      "incremental evaluation must equal the one-shot recompute")
  }

  test("probe plan: corpus enters ONLY via the bucketed index, exchange-free") {
    SigIndex.build(corpus, "sigidx_gate")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // deterministic physical tree for traversal (AQE wraps the plan) and
      // no broadcast, so the index join would need a shuffle if bucketing
      // were not honored
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // an in-memory batch: every file scan in the plan is then provably
      // an index table — the corpus parquet is never touched
      val newDocs = Seq((900001L, "alpha beta gamma")).toDF("doc_id", "text")
      val plan = SigIndex.probe(spark, "sigidx_gate", newDocs)
        .queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      assert(scans.forall(_.tableIdentifier.exists(_.table.startsWith("sigidx_gate"))),
        s"probe must not re-read the corpus: ${scans.flatMap(_.tableIdentifier).mkString(", ")}")
      val postingsScan = scans.filter(_.tableIdentifier.exists(_.table.endsWith("_postings")))
      assert(postingsScan.nonEmpty && postingsScan.forall(_.relation.bucketSpec.nonEmpty),
        "postings must come back through the bucketed table")
      def hasPostings(p: SparkPlan): Boolean = p.collect {
        case s: FileSourceScanExec if s.tableIdentifier.exists(_.table.endsWith("_postings")) => s
      }.nonEmpty
      val idxJoins = plan.collect {
        case j: BaseJoinExec if j.children.exists(hasPostings) => j
      }
      assert(idxJoins.nonEmpty, "expected a join against the postings table")
      for (j <- idxJoins; c <- j.children if hasPostings(c))
        assert(c.collect { case e: ShuffleExchangeLike => e }.isEmpty,
          s"index side of the bucket join must not shuffle:\n${c.toString.take(600)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS sigidx_gate_postings")
      spark.sql("DROP TABLE IF EXISTS sigidx_gate_vocab")
    }
  }

  test("frozen vocabulary: unseen batch tokens drop from the signature") {
    SigIndex.build(corpus, "sigidx_frozen")
    val anchor = corpus.orderBy("doc_id").first()
    // same known-token set as the anchor + one token the model has never
    // seen: the unseen token cannot hash consistently, so the frozen model
    // ignores it and the pair verifies at jaccard 1.0
    val newDocs = Seq((900002L, anchor.getString(1) + " zzzunseenzzz"))
      .toDF("doc_id", "text")
    val got = pairSet(SigIndex.probe(spark, "sigidx_frozen", newDocs))
    assert(got.contains((anchor.getLong(0), 900002L, 1.0)),
      s"expected an exact match against doc ${anchor.getLong(0)}, got $got")
    spark.sql("DROP TABLE IF EXISTS sigidx_frozen_postings")
    spark.sql("DROP TABLE IF EXISTS sigidx_frozen_vocab")
  }

  test("s18: streaming probe-then-append loop ≡ one-shot batch probe (incremental ingest)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    // the incremental production loop: each arriving micro-batch is
    // screened against the index, then absorbed into it — so a later batch
    // sees every earlier one as corpus. The union of per-batch pair sets
    // must equal the one-shot probe of ALL batch docs (each qualifying
    // pair found exactly once: within-batch by the self-join, cross-batch
    // by the index side after the earlier append).
    SigIndex.build(corpus, "sigidx_s18")
    SigIndex.build(corpus, "sigidx_s18x") // untouched twin for the expected set
    val expected = pairSet(SigIndex.probe(spark, "sigidx_s18x", batch))
    val rows = batch.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val chunks = rows.grouped(math.max(1, (rows.length + 2) / 3)).toSeq
    assert(chunks.length >= 2, "fixture must yield multiple micro-batches")
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got ++= pairSet(SigIndex.probe(spark, "sigidx_s18", b))
        SigIndex.append(spark, "sigidx_s18", b)
      }.start()
    try chunks.foreach { c => in.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(got.nonEmpty, "fixture must produce cross-batch near-dups")
    assert(got.toSet == expected,
      s"incremental ∖ one-shot: ${got.toSet -- expected}; one-shot ∖ incremental: ${expected -- got}")
    Seq("s18", "s18x").foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS sigidx_${n}_postings")
      spark.sql(s"DROP TABLE IF EXISTS sigidx_${n}_vocab")
    }
  }

  test("compact after chunked appends: probe bit-identical, bucketed scan intact, files collapse") {
    SigIndex.build(corpus, "sigidx_cpt")
    val rows = batch.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    for (c <- rows.grouped(math.max(1, (rows.length + 3) / 4)))
      SigIndex.append(spark, "sigidx_cpt", c.toDF("doc_id", "text"))
    val fresh = Seq((900010L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val before = pairSet(SigIndex.probe(spark, "sigidx_cpt", fresh))
    val postingsBefore = spark.table("sigidx_cpt_postings")
      .collect().map(_.toString).sorted.toSeq
    val filesBefore = spark.table("sigidx_cpt_postings").inputFiles.length
    assert(!SigIndex.compact(spark, "sigidx_cpt", maxFilesPerBucket = 1000000))
    assert(SigIndex.compact(spark, "sigidx_cpt", maxFilesPerBucket = 0))
    val filesAfter = spark.table("sigidx_cpt_postings").inputFiles.length
    assert(filesAfter <= 32 && filesAfter < filesBefore,
      s"expected ≤32 postings files, got $filesAfter (was $filesBefore)")
    assert(spark.table("sigidx_cpt_postings").collect().map(_.toString).sorted.toSeq
      == postingsBefore, "compaction moves bytes, never rows")
    assert(pairSet(SigIndex.probe(spark, "sigidx_cpt", fresh)) == before,
      "probe must be bit-identical across compact")
    // the rewrite (a saveAsTable + two renames) keeps the (band, bkey)
    // bucket spec in the catalog — lose it and every probe's index side
    // starts shuffling (the plan-level gate above covers the scan shape;
    // AQE wraps this probe's executed plan, so pin the metadata directly)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("sigidx_cpt_postings"))
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets == 32 && b.bucketColumnNames == Seq("band", "bkey")),
      s"compacted postings must still carry the bucket spec, got ${meta.bucketSpec}")
    Seq("postings", "vocab").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS sigidx_cpt_$t"))
  }

  test("large-vocabulary branch (docsets): chunked probe-then-append ≡ one-shot") {
    // >64-token synthetic corpus (HighVocabSpec construction) forces the
    // generic path: verification payloads live in the bucketed docsets
    // table, and append must extend BOTH postings and docsets. Parity is
    // in the frozen token space (batch tokens outside the corpus
    // vocabulary drop on both sides identically).
    val docs = (0 until 30).flatMap { i =>
      val base = (0 until 20).map(k => (i * 7 + k * 3) % 100).toSet
      Seq((2L * i, base), (2L * i + 1, base - base.head + ((i * 7 + 61) % 100)))
    }.map { case (id, ts) =>
      (id, ts.toSeq.sorted.map(t => f"tok$t%03d").mkString(" "))
    }.toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    SigIndex.build(corpus, "sigidx_lv")
    assert(spark.catalog.tableExists("sigidx_lv_docsets"),
      "fixture must exercise the generic (docsets) branch")
    SigIndex.build(corpus, "sigidx_lvx")
    val expected = pairSet(SigIndex.probe(spark, "sigidx_lvx", batch))
    val chunk1 = batch.filter(col("doc_id") < 30)
    val chunk2 = batch.filter(col("doc_id") >= 30)
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    got ++= pairSet(SigIndex.probe(spark, "sigidx_lv", chunk1))
    SigIndex.append(spark, "sigidx_lv", chunk1)
    got ++= pairSet(SigIndex.probe(spark, "sigidx_lv", chunk2))
    SigIndex.append(spark, "sigidx_lv", chunk2)
    assert(got.nonEmpty, "fixture must produce near-dups touching the batch")
    assert(got.toSet == expected,
      s"inc ∖ one-shot: ${got.toSet -- expected}; one-shot ∖ inc: ${expected -- got}")
    Seq("lv", "lvx").foreach { n =>
      Seq("postings", "vocab", "docsets").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS sigidx_${n}_$t"))
    }
  }
}
