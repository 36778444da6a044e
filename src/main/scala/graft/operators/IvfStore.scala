package graft.operators

import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector store with INCREMENTAL APPEND — the [[SigIndex]] /
  * [[LexIndex]] convention applied to ANN serving. A growing corpus does
  * not re-train or re-lay-out its vector index per batch: the quantizer
  * (the Lloyd-trained centroid table) is FROZEN at build time — the
  * tokenizer-checkpoint analogue of SigIndex's frozen vocabulary — and
  * each arriving batch is assigned to its nearest frozen centroid and
  * appended into that cell's partition directory. Rebuild to re-train
  * (centroid drift is a model decision, not a maintenance side effect).
  *
  * Layout under one root `path`:
  *   - `centroids/` `(cid, c)` — the frozen quantizer, ONE small file;
  *     reading it IS the probe's index lookup (O(cells·dim), the LexIndex
  *     query-terms analogue for vectors).
  *   - `vectors/` `(vec_id, e)` hive-partitioned by `cell` — the probe's
  *     nearest-cell filter is a PARTITION filter, so a probe costs the
  *     probed cells' I/O at any corpus size ([[graft.operators.TierTen.q80]]'s
  *     layout, now appendable).
  *   - `ledger/` `(ingest_id, batch_id)` — absorbed stream batches, the
  *     at-least-once replay guard ([[LexIndex.append]]'s semantics: ids are
  *     per streaming query; a second stream passes its own `ingestId`).
  *   - `mirror/` (opt-in, `build(…, mirrored = true)`) — every vector
  *     AGAIN under its runner-up cell, the replication that makes the
  *     celled pair relation's reverse direction partition-prunable for
  *     [[probePairs]] ([[SemanticDedup]]'s incremental pair source).
  *
  * [[graft.operators.TierTwelve.q92]] oracle-checks build+append+probe
  * end to end with q70's own SQL — serving from the appended store must
  * not change a single scored bit (the q80 store-equivalence convention).
  */
object IvfStore {

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean =
    fsOf(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  private def delete(spark: SparkSession, p: String): Unit = {
    val fs = fsOf(spark, p)
    val path = new org.apache.hadoop.fs.Path(p)
    if (fs.exists(path)) fs.delete(path, true)
  }

  private def rename(spark: SparkSession, from: String, to: String): Unit =
    require(fsOf(spark, from).rename(new org.apache.hadoop.fs.Path(from),
      new org.apache.hadoop.fs.Path(to)), s"rename $from -> $to failed")

  /** One Lloyd step from the deterministic first-`k` seeds — the trainer
    * behind q67/q70 ([[TierNine.lloydCentroids]] delegates here), exposed
    * so a store can be trained on one corpus snapshot and serve appends
    * forever after. Returns `(cid, c)` with 6-dp-rounded components (both
    * engines rank identical centroids — the cross-engine determinism
    * rule). */
  def train(emb: DataFrame, k: Int = 4): DataFrame =
    step(emb, emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("e").as("c")))

  /** One Lloyd UPDATE from arbitrary current centroids `(cid, c)`:
    * nearest-centroid assignment, then 6-dp-rounded per-cluster dimension
    * means. [[train]] is `step(emb, first-k seeds)`; the multi-iteration
    * trainer ([[TierFifteen.q109]]) folds this with a driver-collected
    * literal rebuild of the centroids between rounds (k×dim scalars —
    * bounded), which truncates lineage exactly like [[Components]]'
    * per-round checkpoint. */
  def step(emb: DataFrame, cents: DataFrame): DataFrame =
    TierNine.assignTo(emb, cents).join(emb, "vec_id")
      .select(col("cid"), posexplode(col("e")).as(Seq("j", "v")))
      .groupBy("cid", "j").agg(round(avg("v"), 6).as("cv"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(j, cv))), x -> x.cv)").as("c"))

  /** `(vec_id, e, cell)` rows assigned to the nearest stored centroid —
    * the single assignment definition [[build]] and [[append]] share (the
    * LexIndex one-tokenizer contract: both paths must place a vector
    * identically or append ≢ rebuild). */
  private def placed(emb: DataFrame, cents: DataFrame): DataFrame =
    TierNine.assignTo(emb, cents)
      .select(col("vec_id"), col("cid").as("cell"))
      .join(emb, "vec_id")
      .select(col("vec_id"), col("e"), col("cell"))

  /** `(vec_id, e, cell)` rows keyed by the RUNNER-UP centroid — the
    * second-nearest cell under exactly [[TierNine.assignTo]]'s distance
    * and tie-break (squared L2 via the dot identity, ties on lower cid;
    * the [[TierEleven.probeAssign]] probe2 definition). Vectors see no
    * runner when the quantizer has one cell. */
  private def runnerPlaced(emb: DataFrame, cents: DataFrame): DataFrame =
    TierNine.candidates(emb, cents)
      .join(TierNine.assignTo(emb, cents).withColumnRenamed("cid", "owncid"),
        "vec_id")
      .filter(col("cid") =!= col("owncid"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("cell"))
      .join(emb, "vec_id")
      .select(col("vec_id"), col("e"), col("cell"))

  private[operators] def mirrored(spark: SparkSession, path: String): Boolean =
    exists(spark, s"$path/mirror")

  /** Persist the store: freeze `centroids` as the quantizer, assign `emb`
    * against the PERSISTED copy (one source of truth — assignments always
    * derive from the bits a later [[append]] will read), and lay the
    * vectors out partitioned by cell.
    *
    * `mirrored = true` additionally writes `mirror/` — every vector AGAIN
    * under its runner-up cell. That doubles vector storage (the standard
    * multi-probe posting-replication tradeoff) and buys [[probePairs]]
    * its symmetry: the celled near-dup relation pairs a with b when
    * EITHER probes the other's own cell, so an incremental probe must
    * see not only the own-cell members of the batch's probed cells
    * (`vectors/`) but also the stored vectors whose RUNNER-UP cell is a
    * batch own cell — and without the mirror that reverse direction is a
    * full-store scan, because runner-up is not the partition key. With
    * it, both directions are static partition filters. */
  def build(spark: SparkSession, emb: DataFrame, path: String,
      centroids: DataFrame, mirrored: Boolean = false): Unit = {
    Seq("vectors", "ledger", "mirror", "vectors_cpt_tmp", "vectors_cpt_old",
        "ledger_cpt_tmp", "ledger_cpt_old", "mirror_cpt_tmp", "mirror_cpt_old")
      .foreach(d => delete(spark, s"$path/$d"))
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val frozen = spark.read.parquet(s"$path/centroids")
    Warehouse.writePartitioned(placed(emb, frozen), s"$path/vectors", "cell")
    if (mirrored)
      Warehouse.writePartitioned(runnerPlaced(emb, frozen), s"$path/mirror", "cell")
  }

  private def absorbed(spark: SparkSession, path: String, ingestId: String,
      batchId: Long): Boolean =
    exists(spark, s"$path/ledger") &&
      spark.read.parquet(s"$path/ledger")
        .filter(col("ingest_id") === ingestId && col("batch_id") === batchId)
        .limit(1).count() > 0

  /** Absorb a batch of new vectors: assign against the FROZEN quantizer,
    * append into the matching cell partitions (one file per touched cell
    * per batch, no store rewrite — [[compact]] is the maintenance call),
    * record `(ingestId, batchId)` in the ledger AFTER the append so an
    * at-least-once re-delivery skips instead of double-serving the batch
    * ([[LexIndex.append]]'s replay contract). Batch vec_ids must be new. */
  def append(spark: SparkSession, path: String, newVecs: DataFrame,
      batchId: Option[Long] = None, ingestId: String = "default"): Unit = {
    if (batchId.exists(absorbed(spark, path, ingestId, _))) return
    val frozen = spark.read.parquet(s"$path/centroids")
    placed(newVecs, frozen)
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
    // a mirrored store absorbs the batch's runner replicas too — append
    // ≡ rebuild must hold for BOTH layouts or probePairs loses the
    // reverse direction on absorbed batches
    if (mirrored(spark, path))
      runnerPlaced(newVecs, frozen)
        .write.mode("append").partitionBy("cell").parquet(s"$path/mirror")
    batchId.foreach { id =>
      spark.sql(s"SELECT '${ingestId.replace("'", "''")}' AS ingest_id, " +
          s"CAST($id AS BIGINT) AS batch_id")
        .coalesce(1).write.mode("append").parquet(s"$path/ledger")
    }
  }

  /** Exact-cosine top-`k` over the `nprobe` nearest cells. The cell choice
    * reads ONLY the centroid file — ranked by squared L2 in q70's exact
    * expression order (`c·c − 2·c·q + q·q`, ties on lower cid) and
    * collected driver-side: the centroid table is the store's bounded
    * metadata, and the resulting `isin` is a STATIC partition filter, so
    * the vector scan prunes to the probed cells at plan time (numFiles
    * gate in IvfStoreSpec). `excludeId` drops the query's own row BEFORE
    * the top-k (self-search asks for neighbors, not identity). */
  def probe(spark: SparkSession, path: String, query: Seq[Double],
      k: Int = 10, nprobe: Int = 1, excludeId: Option[Long] = None): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    import TierNine.dotc
    val q = typedlit(query)
    val cells = spark.read.parquet(s"$path/centroids")
      .withColumn("d",
        dotc(col("c"), col("c")) - lit(2) * dotc(col("c"), q) + dotc(q, q))
      .orderBy(col("d").asc, col("cid").asc).limit(nprobe)
      .select("cid").collect().map(_.getLong(0)).toSeq
    val store = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(cells: _*))
    val base = excludeId.fold(store)(id => store.filter(col("vec_id") =!= id))
    base.select(col("vec_id"),
        round(dotc(col("e"), q)
          / (sqrt(dotc(col("e"), col("e"))) * sqrt(dotc(q, q))), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Every celled near-dup pair TOUCHING a batch — the incremental face
    * of [[TierNineteen]]'s celled pair detector against a MIRRORED store
    * (build with `mirrored = true`): `(doc_a, doc_b, c)` pairs at exact
    * cosine ≥ `thr` under EXACTLY the batch detector's relation, which
    * is directional — a pair (a, b), a < b, exists iff the SMALLER id's
    * own + runner-up probe set contains the LARGER id's own cell
    * (celledPairsOver joins probed×own and keeps `doc_a < doc_b`, so
    * only the lower endpoint probes). Three candidate legs, all
    * cell-keyed equi-joins:
    *
    *  1. batch as prober — batch (own + runner) rows × `vectors/` own
    *     rows in the batch's probed cells, batch id < stored id;
    *  2. stored as prober — batch own rows × stored rows that PROBE
    *     those cells, stored id < batch id. A stored vector probes cell
    *     c iff its own cell is c (its `vectors/` row) or its runner-up
    *     cell is c (its `mirror/` row — the reverse direction that
    *     would otherwise be a full-store scan, because runner-up is not
    *     the partition key; the reason the mirrored layout exists, at
    *     the standard multi-probe cost of 2× vector storage);
    *  3. batch × batch — the arrivals against each other.
    *
    * Scale: the batch's probed cell ids are bounded driver metadata
    * (≤ 2·|batch|, the [[probe]] rule), so every store read prunes to
    * those cells' partitions at plan time; nothing re-reads or
    * re-assigns the corpus. Zero-vector embeds carry no cosine signal —
    * exclude them upstream (the celled detector's pair-universe rule).
    */
  def probePairs(spark: SparkSession, path: String, batch: DataFrame,
      thr: Double): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    import TierNine.dotc
    val frozen = spark.read.parquet(s"$path/centroids")
    val own = TierNine.assignTo(batch, frozen)
    val probed = TierEleven.probeAssign(batch, frozen, own, probe2 = true)
    val probedCells = probed.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val ownCells = own.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    def norm(c: org.apache.spark.sql.Column) = sqrt(dotc(c, c))
    // batch sides: as prober (own + runner rows) and as target (own rows)
    val bp = probed.join(batch, "vec_id")
      .select(col("cid"), col("vec_id").as("pid"), col("e").as("pe"))
    val bt = own.join(batch, "vec_id")
      .select(col("cid"), col("vec_id").as("tid"), col("e").as("te"))
    // stored sides: targets live in their own cell (vectors/); probers
    // of a cell are its own members (vectors/) plus its runner-up
    // members (mirror/)
    val st = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("cell").as("cid"), col("vec_id").as("tid"), col("e").as("te"))
    val sp = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(ownCells: _*))
      .unionByName(spark.read.parquet(s"$path/mirror")
        .filter(col("cell").isin(ownCells: _*)))
      .select(col("cell").as("cid"), col("vec_id").as("pid"), col("e").as("pe"))
    val cand = bp.join(st, Seq("cid"))       // leg 1: batch probes stored
      .unionByName(sp.join(bt, Seq("cid"))   // leg 2: stored probes batch
        .select(col("cid"), col("pid"), col("pe"), col("tid"), col("te")))
      .unionByName(bp.join(bt, Seq("cid")))  // leg 3: batch × batch
    cand.filter(col("pid") < col("tid"))
      .withColumn("c",
        dotc(col("pe"), col("te")) / (norm(col("pe")) * norm(col("te"))))
      .filter(col("c") >= thr)
      .select(col("pid").as("doc_a"), col("tid").as("doc_b"), col("c"))
      .distinct()
  }

  /** Maintenance after sustained ingest — the partitioned-path twin of
    * [[LexIndex.compact]]: rewrite the vector partitions to one file per
    * cell (repartition by cell, then swap directories) and fold the ledger
    * to a single file with rows preserved exactly. Threshold-gated on the
    * average file count per cell so the ingest loop can call it every
    * batch; pass 0 to force. Probes before and after are bit-identical
    * (IvfStoreSpec pins it). */
  def compact(spark: SparkSession, path: String,
      maxFilesPerCell: Int = 4): Boolean = {
    val vecDir = s"$path/vectors"
    val files = spark.read.parquet(vecDir).inputFiles.length
    val cells = fsOf(spark, vecDir)
      .listStatus(new org.apache.hadoop.fs.Path(vecDir))
      .count(_.getPath.getName.startsWith("cell="))
    if (files <= cells.toLong * maxFilesPerCell) return false
    val tmp = s"$path/vectors_cpt_tmp"
    val old = s"$path/vectors_cpt_old"
    Seq(tmp, old).foreach(d => delete(spark, d))
    Warehouse.writePartitioned(
      spark.read.parquet(vecDir).repartition(col("cell")), tmp, "cell")
    rename(spark, vecDir, old)
    rename(spark, tmp, vecDir)
    delete(spark, old)
    if (mirrored(spark, path)) {
      val mDir = s"$path/mirror"
      val mTmp = s"$path/mirror_cpt_tmp"
      val mOld = s"$path/mirror_cpt_old"
      Seq(mTmp, mOld).foreach(d => delete(spark, d))
      Warehouse.writePartitioned(
        spark.read.parquet(mDir).repartition(col("cell")), mTmp, "cell")
      rename(spark, mDir, mOld)
      rename(spark, mTmp, mDir)
      delete(spark, mOld)
    }
    Warehouse.foldToOneFile(spark, s"$path/ledger")
    true
  }
}
