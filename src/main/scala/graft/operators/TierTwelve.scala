package graft.operators

import graft.Q
import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** Tier 12 (round 7): index lifecycle under sustained ingest — the
  * appendable IVF vector store served end to end.
  */
object TierTwelve {

  /** The trained-IVF ANN served from a store built INCREMENTALLY — q70's
    * exact semantics (same oracle SQL), but the store is [[IvfStore]]:
    * the quantizer is trained once on the corpus (the oracle's own
    * training set), a THIRD of the vectors are laid out at build time,
    * and the rest arrive as two ledgered appends assigned against the
    * frozen centroids — then the probe (nearest-cell partition filter +
    * exact cosine over the probed cell) must reproduce the one-shot
    * answer bit for bit. This is the q80 store-equivalence convention
    * extended to the APPEND path: serving from an incrementally-grown
    * store changes nothing a user can observe.
    *
    * Scale: each append moves only the batch (assign against a broadcast
    * centroid table, append one file per touched cell); the probe reads
    * one cell directory at any corpus size. [[IvfStore.compact]] bounds
    * the file accumulation (IvfStoreSpec).
    */
  val q92 = Q("q92_ann_ivf_append", TierNine.q70.oracle.get) { (s, dir) =>
    val path = Warehouse.scratchDir("graft_ivf_append")
    val emb = TierNine.embOf(s, dir)
    IvfStore.build(s, emb.filter(col("vec_id") % 3 === 0), path,
      TierNine.lloydCentroids(s, dir))
    IvfStore.append(s, path, emb.filter(col("vec_id") % 3 === 1),
      batchId = Some(0L))
    IvfStore.append(s, path, emb.filter(col("vec_id") % 3 === 2),
      batchId = Some(1L))
    // the query vector: one bounded driver read (the probe API takes a
    // vector, as a serving layer would)
    val q0 = emb.filter(col("vec_id") === 0).head.getSeq[Double](1).toSeq
    IvfStore.probe(s, path, q0, k = 10, nprobe = 1, excludeId = Some(0L))
  }

  /** Exact-phrase containment FROM THE POSITIONAL INDEX — the
    * contamination-check primitive ("is this eval text in my corpus,
    * verbatim?") q47/q78 approximate with trigram shingles, now answered
    * through [[LexIndex]]'s persisted posting lists: positions ride the
    * postings, so the probe is a bucket-pruned scan of the phrase terms'
    * buckets + one broadcast slot join — document bodies are never read
    * at query time (the plan gate in LexIndexSpec). The oracle recomputes
    * phrase starts declaratively over the corpus; the index path must
    * match it hit for hit.
    *
    * Scale: the index side scales with the probed terms' posting lists
    * (not the corpus); the (doc, start) alignment group is a hash
    * aggregation over positions of those lists only. The declared query
    * pays the one-time positional build only because the driver runs it
    * cold (q87's economics).
    */
  val q93 = Q("q93_phrase_probe",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |p AS (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks FROM t)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS hits
      |FROM p WHERE toks[i] = 'window' AND toks[i + 1] = 'hash'
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val name = LexIndex.scratchName(s, "lexidx_q93")
    LexIndex.build(
      graft.Tables.load(s, dir, "documents").select("doc_id", "text"), name)
    LexIndex.phraseProbe(s, name, Seq("window", "hash"))
  }

  val all: Seq[Q] = Seq(q92, q93)
}
