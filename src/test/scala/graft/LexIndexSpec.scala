package graft

import graft.operators.{LexIndex, TierEleven}
import org.apache.spark.sql.functions._

/** Persisted inverted index: store-served BM25 must equal the direct
  * computation, and the probe must actually behave like an index — a
  * bucket-pruned postings scan, no document bodies, no corpus re-tokenize.
  */
class LexIndexSpec extends SparkSpec {

  private val name = "lexidx_spec"
  private lazy val built: Unit =
    LexIndex.build(
      Tables.load(spark, sf, "documents").select("doc_id", "text"), name)

  test("probe from the store ≡ q82 computed from the corpus, bit for bit") {
    built
    val fromStore = LexIndex.probe(spark, name, Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = TierEleven.q82.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fromStore == direct)
  }

  test("probe plan: bucket-pruned postings scan, no bodies, no re-tokenize") {
    built
    val plan = LexIndex.probe(spark, name, Seq("spark", "window", "hash"))
      .queryExecution.executedPlan.toString
    // the index lookup IS bucket pruning: only the query terms' buckets scan
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val hits = sel.findAllMatchIn(plan).toSeq
    assert(hits.nonEmpty, s"no bucket pruning in plan:\n${plan.take(1500)}")
    assert(hits.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"scan reads every bucket: ${hits.map(_.matched)}")
    // an index probe never touches the corpus: no text column, no split()
    assert(!plan.contains("documents.parquet"), "probe must not rescan the corpus")
    assert(!plan.toLowerCase.contains("split("), "probe must not re-tokenize")
  }

  test("unknown query terms miss cleanly (no postings, empty result)") {
    built
    assert(LexIndex.probe(spark, name, Seq("zzqx")).isEmpty)
  }

  test("incremental append ≡ from-scratch rebuild over the union") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val incName = "lexidx_inc"
    LexIndex.build(docs.filter(col("doc_id") % 5 =!= 0), incName)
    LexIndex.append(spark, incName, docs.filter(col("doc_id") % 5 === 0))
    val incremental = LexIndex.probe(spark, incName, Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the truth: one build over everything (scores shift corpus-wide on
    // append — BM25's n/df/avgdl move — so only the full union compares)
    val fullName = "lexidx_full"
    LexIndex.build(docs, fullName)
    val rebuilt = LexIndex.probe(spark, fullName, Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(incremental == rebuilt)
    // and the appended side must actually be reachable: some % 5 == 0 doc
    // scores somewhere in the full posting lists
    val appendedSeen = spark.table(s"${incName}_postings")
      .filter(col("doc_id") % 5 === 0).limit(1).count()
    assert(appendedSeen == 1L, "appended postings must be visible to probes")
  }

  test("s25: streaming ingest (foreachBatch append) — final probe ≡ full rebuild") {
    // the live ingest loop: arriving micro-batches absorb into the index
    // on the stream's CLONED session (the s18 staleness class — append's
    // caller-session refresh is what this exercises); after the stream
    // drains, a probe must equal a from-scratch build over everything
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    LexIndex.build(docs.filter(col("doc_id") % 3 === 0), "lexidx_s25")
    val rest = docs.filter(col("doc_id") % 3 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val chunks = rest.grouped(math.max(1, (rest.length + 2) / 3)).toSeq
    assert(chunks.length >= 2, "fixture must yield multiple micro-batches")
    val in = MemoryStream[(Long, String)]
    var lastBatch: Option[(Long, Seq[(Long, String)])] = None
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        lastBatch = Some(id -> b.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
        LexIndex.append(spark, "lexidx_s25", b, batchId = Some(id))
      }.start()
    try chunks.foreach { c => in.addData(c); q.processAllAvailable() }
    finally q.stop()
    val terms = Seq("spark", "window", "hash")
    val streamed = LexIndex.probe(spark, "lexidx_s25", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    LexIndex.build(docs, "lexidx_s25x")
    val rebuilt = LexIndex.probe(spark, "lexidx_s25x", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == rebuilt)
    // at-least-once replay: re-deliver the final batch with its original
    // batchId (the post-crash epoch-replay shape) — the ledger must skip
    // it, leaving every score bit unchanged
    val (id, rows2) = lastBatch.get
    import spark.implicits._
    LexIndex.append(spark, "lexidx_s25", rows2.toDF("doc_id", "text"), batchId = Some(id))
    val replayed = LexIndex.probe(spark, "lexidx_s25", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(replayed == rebuilt, "replayed batch must be skipped, not double-counted")
  }

  test("a second ingest stream's batch 0 is absorbed, not skipped (ingestId namespace)") {
    // foreachBatch batch ids restart at 0 per streaming query: without the
    // ingest_id namespace a new stream's early batches would collide with
    // the first stream's ledger rows and be silently LOST
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    LexIndex.build(docs.filter(col("doc_id") % 3 === 0), "lexidx_ns")
    LexIndex.append(spark, "lexidx_ns", docs.filter(col("doc_id") % 3 === 1),
      batchId = Some(0L))
    // same batchId, DIFFERENT stream: must absorb
    LexIndex.append(spark, "lexidx_ns", docs.filter(col("doc_id") % 3 === 2),
      batchId = Some(0L), ingestId = "stream2")
    val got = LexIndex.probe(spark, "lexidx_ns", Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    LexIndex.build(docs, "lexidx_nsx")
    val full = LexIndex.probe(spark, "lexidx_nsx", Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == full)
    // and the replay guard still holds per stream: re-delivering stream2's
    // batch 0 changes nothing
    LexIndex.append(spark, "lexidx_ns", docs.filter(col("doc_id") % 3 === 2),
      batchId = Some(0L), ingestId = "stream2")
    val replayed = LexIndex.probe(spark, "lexidx_ns", Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(replayed == full)
  }

  test("phraseProbe ≡ brute force over the corpus (multi-term, repeated-term, single, absent)") {
    built
    val toks: Map[Long, Array[String]] = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap
    def brute(phrase: Seq[String]): Seq[(Long, Long)] =
      toks.toSeq.map { case (id, ts) =>
        id -> (0 to ts.length - phrase.length)
          .count(i => phrase.indices.forall(j => ts(i + j) == phrase(j))).toLong
      }.filter(_._2 > 0).sortBy(_._1)
    for (phrase <- Seq(Seq("window", "hash"), Seq("window", "window"),
        Seq("spark"), Seq("spark", "window", "window"), Seq("zzqx", "window"))) {
      val got = LexIndex.phraseProbe(spark, name, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == brute(phrase), s"phrase $phrase diverged from brute force")
    }
    // fixture sanity: the headline phrase matches somewhere, and some doc
    // holds it more than once (the hits column is exercised)
    val hits = LexIndex.phraseProbe(spark, name, Seq("window", "hash"))
      .collect().map(_.getLong(1))
    assert(hits.nonEmpty && hits.exists(_ > 1L),
      "fixture must contain the phrase, with at least one multi-hit document")
  }

  test("phraseProbe plan: bucket-pruned postings scan, no bodies, no re-tokenize") {
    built
    val plan = LexIndex.phraseProbe(spark, name, Seq("window", "hash"))
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val hits = sel.findAllMatchIn(plan).toSeq
    assert(hits.nonEmpty, s"no bucket pruning in plan:\n${plan.take(1500)}")
    assert(hits.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"scan reads every bucket: ${hits.map(_.matched)}")
    assert(!plan.contains("documents.parquet"), "probe must not rescan the corpus")
    assert(!plan.toLowerCase.contains("split("), "probe must not re-tokenize")
  }

  test("phraseProbe after append ≡ over a from-scratch rebuild (positions are ingest-path-invariant)") {
    // unlike BM25 scores (which move corpus-wide on append by definition),
    // phrase hits depend only on each document's own positions — append vs
    // rebuild must agree exactly
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val incName = "lexidx_pinc"
    LexIndex.build(docs.filter(col("doc_id") % 4 =!= 0), incName)
    LexIndex.append(spark, incName, docs.filter(col("doc_id") % 4 === 0))
    val fullName = "lexidx_pfull"
    LexIndex.build(docs, fullName)
    val phrase = Seq("window", "hash")
    val inc = LexIndex.phraseProbe(spark, incName, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = LexIndex.phraseProbe(spark, fullName, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inc == full && inc.nonEmpty)
  }

  test("compact after sustained ingest: probe bit-identical, files collapse, ledger folds, replay guard intact") {
    // the round-7 maintenance item: append leaves one file per touched
    // bucket per batch + one ledger file per batch; compact must undo the
    // accumulation without moving a single scored bit
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val n = "lexidx_cpt"
    LexIndex.build(docs.filter(col("doc_id") % 7 === 0), n)
    for (r <- 1 until 7)
      LexIndex.append(spark, n, docs.filter(col("doc_id") % 7 === r),
        batchId = Some(r.toLong))
    val terms = Seq("spark", "window", "hash")
    val before = LexIndex.probe(spark, n, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val postingsBefore = spark.table(s"${n}_postings")
      .collect().map(_.toString).sorted.toSeq
    val filesBefore = spark.table(s"${n}_postings").inputFiles.length
    val ledgerBefore = spark.table(s"${n}_ledger")
      .collect().map(_.toString).sorted.toSeq
    assert(spark.table(s"${n}_ledger").inputFiles.length == 6,
      "fixture invariant: one ledger file per absorbed batch")
    // below the threshold the maintenance call is a no-op file listing
    assert(!LexIndex.compact(spark, n, maxFilesPerBucket = 1000000))
    assert(spark.table(s"${n}_postings").inputFiles.length == filesBefore)
    // force the rewrite
    assert(LexIndex.compact(spark, n, maxFilesPerBucket = 0))
    val filesAfter = spark.table(s"${n}_postings").inputFiles.length
    assert(filesAfter <= 32 && filesAfter < filesBefore,
      s"expected ≤32 files (one per bucket), got $filesAfter (was $filesBefore)")
    assert(spark.table(s"${n}_ledger").inputFiles.length == 1,
      "the ledger must fold to a single file")
    assert(spark.table(s"${n}_ledger").collect().map(_.toString).sorted.toSeq
      == ledgerBefore, "folding must preserve every absorbed (ingest_id, batch_id)")
    assert(spark.table(s"${n}_postings").collect().map(_.toString).sorted.toSeq
      == postingsBefore, "compaction moves bytes, never rows")
    val after = LexIndex.probe(spark, n, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == before, "probe must be bit-identical across compact")
    // the rewrite must keep the bucket spec: probes stay bucket-pruned
    val plan = LexIndex.probe(spark, n, terms)
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val hits = sel.findAllMatchIn(plan).toSeq
    assert(hits.nonEmpty && hits.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"compacted probe lost bucket pruning:\n${plan.take(1200)}")
    // the folded ledger is still the replay record: a re-delivered batch
    // id must skip, leaving every score bit unchanged
    LexIndex.append(spark, n, docs.filter(col("doc_id") % 7 === 3),
      batchId = Some(3L))
    val replayed = LexIndex.probe(spark, n, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(replayed == before, "replay guard must survive the ledger fold")
  }

  test("bootstrap: build on an EMPTY corpus, stream everything in") {
    // the production cold-start: an empty index absorbs its whole corpus
    // incrementally; the empty build's stats row must read as (0, 0), not
    // NULL (the first append would NPE otherwise)
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    LexIndex.build(docs.filter(lit(false)), "lexidx_boot")
    LexIndex.append(spark, "lexidx_boot", docs, batchId = Some(0L))
    val boot = LexIndex.probe(spark, "lexidx_boot", Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    LexIndex.build(docs, "lexidx_bootx")
    val full = LexIndex.probe(spark, "lexidx_bootx", Seq("spark", "window", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(boot == full)
  }
}
