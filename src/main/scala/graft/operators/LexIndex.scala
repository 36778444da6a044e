package graft.operators

import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted INVERTED INDEX — the incremental shape of lexical retrieval
  * ([[SigIndex]]'s pattern applied to BM25): a corpus is tokenized ONCE and
  * its posting lists written as a bucketed table; every later query reads
  * only the matching token buckets and never touches document bodies.
  *
  * Layout:
  *   - `<name>_postings` `(token, doc_id, tf, dl, positions)` — bucketed
  *     by `token`. Document length rides the posting (the
  *     impact-ordered-list trick) so scoring needs NO doc-side join, and
  *     the sorted position list makes the index POSITIONAL
  *     ([[phraseProbe]]). A probe filters `token IN (...)`,
  *     which Spark prunes to the matching BUCKETS at plan time
  *     (`SelectedBucketsCount` in the scan — gated in LexIndexSpec): query
  *     cost scales with the posting lists touched, not the corpus.
  *   - `<name>_dict` `(token, df)` — the lexicon; the probe's slice of it
  *     is |query| rows, broadcast.
  *   - `<name>_stats` one row `(n, total_toks)` — corpus totals for the
  *     BM25 length norm, broadcast.
  *   - `<name>_ledger` `(batch_id)` — absorbed stream batch ids, the
  *     idempotence record for at-least-once replay (see [[append]]).
  *
  * Unlike [[SigIndex]] there is no frozen vocabulary: tokens join as
  * strings, so new query terms simply miss (df = 0 ⇒ no postings).
  * [[TierEleven.q87]] oracle-checks build+probe end to end — with
  * [[TierEleven.q82]]'s own SQL, because serving from the store must not
  * change a single scored bit (the q80 store-equivalence convention).
  */
object LexIndex {

  /** One tokenize pass shared by [[build]] and [[append]] — the
    * append ≡ rebuild contract (LexIndexSpec) requires both paths to
    * tokenize identically, so there is exactly one definition.
    * Returns `(tf, dl)`: per-(doc, token) counts WITH sorted position
    * lists (0-based over the empty-filtered token sequence — the
    * positional-postings payload [[phraseProbe]] reads; the standard
    * positional-index size trade, and [[probe]] never deserializes the
    * column) and per-doc lengths; `tf` arrives persisted (it feeds
    * postings + dict + dl), caller unpersists. */
  private def tokenStats(docs: DataFrame): (DataFrame, DataFrame) = {
    val tf = docs
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), t => t =!= ""))
          .as(Seq("pos", "token")))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .persist()
    (tf, tf.groupBy("doc_id").agg(sum("tf").as("dl")))
  }

  /** A per-run UNIQUE index name, its table directories swept at JVM
    * exit — for declared queries that build a throwaway index per run
    * (q87/q93): a fixed shared name lets two concurrent Verify/Bench
    * runs race (one run's `build` sweeps the other's tables mid-probe),
    * and uniquely-named tables would otherwise accumulate in the shared
    * warehouse directory run over run (the in-memory catalog entry dies
    * with the session; the directory does not). */
  def scratchName(spark: SparkSession, prefix: String): String = {
    val name = prefix + "_" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    Seq("postings", "dict", "stats", "ledger",
        "dict_tmp", "dict_old", "stats_tmp", "stats_old")
      .foreach(t => Warehouse.sweepTableAtExit(spark, s"${name}_$t"))
    name
  }

  /** Tokenize `docs` (any `(doc_id, text)` frame) and persist the index
    * tables. Pays one corpus tokenize + one bucketing shuffle; every later
    * [[probe]] is bucket-pruned scan + broadcast joins. */
  def build(docs: DataFrame, name: String, buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    Seq("postings", "dict", "stats", "ledger",
        "dict_tmp", "dict_old", "stats_tmp", "stats_old")
      .foreach(t => SigIndex.dropStale(spark, s"${name}_$t"))
    val (tf, dl) = tokenStats(docs)
    Warehouse.writeBucketed(
      tf.join(dl, "doc_id").select("token", "doc_id", "tf", "dl", "positions"),
      s"${name}_postings", buckets, "token")
    tf.groupBy("token").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${name}_dict")
    // coalesce: an EMPTY corpus (the bootstrap "build empty, stream
    // everything in" shape) sums dl to NULL, and append's driver-side
    // stats merge reads this row as primitive longs
    docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(coalesce(sum("dl"), lit(0L)).as("total_toks")))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${name}_stats")
    tf.unpersist()
  }

  /** Has `(ingestId, batchId)` already been absorbed? (No ledger table =
    * nothing absorbed yet.) */
  private def absorbed(spark: SparkSession, name: String, ingestId: String,
      batchId: Long): Boolean =
    spark.catalog.tableExists(s"${name}_ledger") &&
      spark.table(s"${name}_ledger")
        .filter(col("ingest_id") === ingestId && col("batch_id") === batchId)
        .limit(1).count() > 0

  /** Absorb a new batch into the index — the incremental loop
    * ([[SigIndex.append]]'s economics, lexical flavor): the batch's
    * postings APPEND (one file per touched bucket, no corpus rewrite,
    * bucket-pruned probes intact), while the two small side tables MERGE —
    * the lexicon by summed document frequencies via a temp-table swap
    * (its merged plan reads the table it replaces, so it must materialize
    * before the old table moves), and the one-row stats driver-side. No
    * frozen vocabulary: unseen batch tokens simply extend the lexicon.
    * Batch doc_ids must be new (an existing id would double-count its
    * postings). Refreshes the caller session's tables — the foreachBatch
    * cloned-session staleness lesson (SigIndex s18).
    *
    * REPLAY SAFETY: foreachBatch delivery is at-least-once — a batch whose
    * epoch didn't commit is re-delivered after restart, and a blind
    * re-append would silently double-count postings/df/n (BM25 scores
    * corrupt with no error). Pass foreachBatch's `batchId`: absorbed ids
    * are recorded in `<name>_ledger` AFTER the append completes and
    * replayed ids are skipped (s25 replays a batch to pin this). Batch ids
    * are scoped to ONE streaming query's checkpoint and restart at 0 for a
    * new query — a second ingest stream MUST pass its own `ingestId` (the
    * Delta txnAppId convention) or its early batches would collide with
    * the first stream's ledger rows and be silently SKIPPED; the ledger
    * key is `(ingest_id, batch_id)` and the spec pins that a new ingestId
    * absorbs batch 0 on an index whose default stream already used it.
    * The ledger closes the common replay window (completed batch,
    * uncommitted epoch); a crash MID-append still needs a rebuild —
    * multi-table atomicity is a transactional table format's job
    * (Delta/Iceberg in production), not plain parquet's.
    *
    * The dict and stats swaps never strand the index without their table:
    * each replacement materializes fully, THEN the old table moves aside,
    * the new one renames in, and only then does the old drop.
    *
    * Scoring note: an append changes n/total_toks/df, so scores move
    * corpus-wide — that is BM25's definition, not an artifact; [[probe]]
    * after append ≡ a from-scratch [[build]] over the union
    * (LexIndexSpec pins it).
    */
  def append(spark: SparkSession, name: String, newDocs: DataFrame,
      buckets: Int = 32, batchId: Option[Long] = None,
      ingestId: String = "default"): Unit = {
    if (batchId.exists(absorbed(spark, name, ingestId, _))) return
    // the batch is read by the postings write AND the stats count — pin it
    // so a source-backed micro-batch isn't re-scanned per consumer
    val docs = newDocs.persist()
    val (tf, dl0) = tokenStats(docs)
    val dl = dl0.persist()
    Warehouse.appendBucketed(
      tf.join(dl, "doc_id").select("token", "doc_id", "tf", "dl", "positions"),
      s"${name}_postings", buckets, "token")
    // lexicon merge via swap: materialize to _tmp (the plan reads _dict),
    // move _dict aside, move _tmp in, drop the old — at every step a
    // complete lexicon exists under some name
    val tmp = s"${name}_dict_tmp"
    val oldT = s"${name}_dict_old"
    Seq(tmp, oldT).foreach(t => SigIndex.dropStale(spark, t))
    spark.table(s"${name}_dict")
      .unionAll(tf.groupBy("token").agg(count(lit(1)).as("df")))
      .groupBy("token").agg(sum("df").as("df"))
      .write.format("parquet").saveAsTable(tmp)
    spark.sql(s"ALTER TABLE ${name}_dict RENAME TO $oldT")
    spark.sql(s"ALTER TABLE $tmp RENAME TO ${name}_dict")
    SigIndex.dropStale(spark, oldT)
    val old = spark.table(s"${name}_stats").collect()(0)
    val add = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(coalesce(sum("dl"), lit(0L)).as("t")))
      .collect()(0)
    tf.unpersist(); dl.unpersist(); docs.unpersist()
    // stats replacement gets the same swap as the dict — no window where
    // the index lacks a stats table
    val statsTmp = s"${name}_stats_tmp"
    val statsOld = s"${name}_stats_old"
    Seq(statsTmp, statsOld).foreach(t => SigIndex.dropStale(spark, t))
    spark.sql(
      s"""SELECT CAST(${old.getLong(0) + add.getLong(0)} AS BIGINT) AS n,
         |       CAST(${old.getLong(1) + add.getLong(1)} AS BIGINT) AS total_toks
         |""".stripMargin)
      .write.format("parquet").saveAsTable(statsTmp)
    spark.sql(s"ALTER TABLE ${name}_stats RENAME TO $statsOld")
    spark.sql(s"ALTER TABLE $statsTmp RENAME TO ${name}_stats")
    SigIndex.dropStale(spark, statsOld)
    batchId.foreach { id =>
      spark.sql(s"SELECT '${ingestId.replace("'", "''")}' AS ingest_id, " +
          s"CAST($id AS BIGINT) AS batch_id")
        .write.mode("append").format("parquet").saveAsTable(s"${name}_ledger")
    }
    Seq("postings", "dict", "stats")
      .foreach(t => spark.catalog.refreshTable(s"${name}_$t"))
  }

  /** Exact-PHRASE containment over the positional postings — the
    * contamination-check primitive ("is this eval sentence in my corpus,
    * verbatim?") that q47/q78 approximate with shingles, answered from
    * the persisted index: a document contains the phrase at `start` iff
    * every slot `i` of the phrase has a posting position `start + i`, so
    * each slot's positions shift back by the slot offset and a
    * (doc, start) group counting every slot is an occurrence. Returns
    * `(doc_id, hits)` for documents containing the phrase, doc-ordered.
    *
    * The `isin` over the phrase's DISTINCT terms is the same index lookup
    * as [[probe]]: a bucket-pruned postings scan (`SelectedBucketsCount`
    * gated) that never touches document bodies — query cost scales with
    * the phrase terms' posting lists, not the corpus. Repeated phrase
    * terms keep their slots (the slot table is a broadcast-tiny literal
    * frame), so "window window" needs two distinct start alignments of
    * ONE posting row, not two rows. */
  def phraseProbe(spark: SparkSession, name: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phraseProbe needs at least one term")
    val post = spark.table(s"${name}_postings")
      .filter(col("token").isin(terms.distinct: _*))
    val values = terms.zipWithIndex
      .map { case (t, i) => s"($i, '${t.replace("'", "''")}')" }.mkString(", ")
    val slots = spark.sql(s"SELECT * FROM VALUES $values AS t(slot, token)")
    post.join(broadcast(slots), "token")
      .select(col("doc_id"), col("slot"), explode(col("positions")).as("p"))
      .select(col("doc_id"), col("slot"), (col("p") - col("slot")).as("start"))
      .groupBy("doc_id", "start")
      // positions are distinct per (doc, token) and slots distinct by
      // construction, so plain count ≡ distinct-slot count
      .agg(count(lit(1)).as("k"))
      .filter(col("k") === terms.length)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("hits"))
      .orderBy("doc_id")
  }

  /** Compact the index after sustained incremental ingest. [[append]]'s
    * economics (one file per touched bucket per batch, one ledger file per
    * batch, no corpus rewrite) are right per batch but accumulate: after
    * 10⁴ micro-batches a probe opens 10⁴ files per term bucket. This is
    * the maintenance call the ingest loop runs every batch — below the
    * `maxFilesPerBucket` threshold it costs one file listing and returns
    * false; above it, the postings rewrite to one sorted file per bucket
    * ([[Warehouse.compactBucketed]] — bucket spec unchanged, so probes
    * stay bucket-pruned) and the ledger FOLDS to a single file (rows
    * preserved exactly — the ledger is the replay-safety record, so
    * folding must not lose an absorbed (ingest_id, batch_id)). Pass 0 to
    * force. Probes before and after are bit-identical and replayed batch
    * ids still skip (LexIndexSpec pins both). `buckets` must match the
    * [[build]] value. */
  def compact(spark: SparkSession, name: String, buckets: Int = 32,
      maxFilesPerBucket: Int = 4): Boolean = {
    val postings = s"${name}_postings"
    if (spark.table(postings).inputFiles.length <= buckets.toLong * maxFilesPerBucket)
      return false
    Warehouse.compactBucketed(spark, postings, buckets, "token")
    val ledger = s"${name}_ledger"
    if (spark.catalog.tableExists(ledger) &&
        spark.table(ledger).inputFiles.length > 1) {
      val tmp = s"${ledger}_tmp"
      val old = s"${ledger}_old"
      Seq(tmp, old).foreach(t => SigIndex.dropStale(spark, t))
      spark.table(ledger).coalesce(1)
        .write.format("parquet").saveAsTable(tmp)
      spark.sql(s"ALTER TABLE $ledger RENAME TO $old")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $ledger")
      SigIndex.dropStale(spark, old)
      spark.catalog.refreshTable(ledger)
    }
    true
  }

  /** BM25 top-`k` over the persisted index — [[TierEleven.q82]]'s exact
    * integer formula, fed from posting lists instead of the corpus. The
    * `isin` filter is the index lookup: it prunes the bucketed scan to the
    * query terms' buckets. */
  def probe(spark: SparkSession, name: String, terms: Seq[String], k: Int = 10): DataFrame = {
    val post = spark.table(s"${name}_postings").filter(col("token").isin(terms: _*))
    val dict = spark.table(s"${name}_dict").filter(col("token").isin(terms: _*))
    val stats = spark.table(s"${name}_stats")
    post.join(broadcast(dict), "token")
      .crossJoin(broadcast(stats))
      .withColumn("score_t", expr(TierEleven.bm25Score(spark)))
      .groupBy("doc_id").agg(sum("score_t").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
