package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 7 — round-5 additions: the cluster-level view of deduplication
  * (connected components over near-dup pairs), the Bloom-filter membership
  * screen, and bigram language-model quality scoring — three operators a
  * training-data pipeline runs between detection and filtering. Determinism
  * follows the Tier-3/4 conventions (integer arithmetic end to end, pinned
  * orders; no floats anywhere in this tier).
  */
object TierSeven {

  /** Near-duplicate CLUSTER inventory: MinHash+LSH pairs (q26's exact
    * pipeline) → connected components ([[Components.connected]]) → cluster
    * size histogram. Pairwise dropping under-deduplicates when similarity
    * chains (A≈B≈C with A̸≈C is ONE cluster, two drops); the component
    * labeling is what a production dedup actually applies — keep each
    * cluster's min doc_id, drop the rest. Output: (csize, n_clusters) —
    * the dedup planner's first question ("how big are my duplicate
    * families?").
    *
    * Scale: the LSH stage is q26's (bucketed, never all-pairs); the CC
    * stage is O(diameter) shuffle rounds on the pair list (see
    * [[Components]] scaladoc). The oracle recomputes the components with a
    * recursive CTE propagating min labels along edges — same fixpoint,
    * declarative form.
    */
  val q55 = Q("q55_dedup_clusters",
    s"""WITH RECURSIVE
       |pairs AS (${TierFour.minhashSql("documents")}),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT doc_id AS id FROM documents),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |cl AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize FROM lab GROUP BY lbl)
       |SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters
       |FROM cl GROUP BY csize ORDER BY csize""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val pairs = TierFour.minhashPairs(TextOps.tok(s, dir))
    Components.connected(
        docs.select(col("doc_id").as("id")),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .groupBy("lbl").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
      .orderBy("csize")
  }

  /** Bloom-filter blocklist screen: compress a removal list (here: docs
    * under 150 chars — the classic length filter — standing in for any
    * prior stage's drop list) into a [[graft.functions.Bloom]] filter,
    * probe the whole corpus, and report per language how many docs the
    * filter flags vs how many are truly blocked. flagged ≥ blocked always
    * (no false negatives); the surplus is the filter's one-sided error,
    * which a pipeline either verifies exactly or accepts. At 100 TB the
    * point is the plan shape: the blocklist side collapses to ≤ `bits`
    * broadcast rows, so the corpus-side probe is map-side only — compare
    * q53's shuffle join against a full-width drop list.
    */
  val q56 = Q("q56_bloom_blocklist",
    """WITH blocked AS (SELECT doc_id FROM documents WHERE n_chars < 150),
      |pos AS (
      |  SELECT DISTINCT ((2654435761*(j+1)) % 2147483647 * (doc_id % 2147483647)
      |       + (40503*(j+1)) % 2147483647) % 2147483647 % 512 AS pos
      |  FROM blocked CROSS JOIN (SELECT unnest(range(3)) AS j)),
      |probe AS (
      |  SELECT d.doc_id, d.lang, d.n_chars, count(p.pos) AS hits
      |  FROM (SELECT doc_id, lang, n_chars,
      |          ((2654435761*(j+1)) % 2147483647 * (doc_id % 2147483647)
      |           + (40503*(j+1)) % 2147483647) % 2147483647 % 512 AS pos
      |        FROM documents CROSS JOIN (SELECT unnest(range(3)) AS j)) d
      |  LEFT JOIN pos p USING (pos)
      |  GROUP BY 1, 2, 3)
      |SELECT lang,
      |  CAST(sum(CASE WHEN hits = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
      |FROM probe GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val blocked = docs.filter(col("n_chars") < 150).select(col("doc_id"))
    val f = graft.functions.Bloom.build(blocked, col("doc_id"))
    graft.functions.Bloom.mightContain(
        docs.select("doc_id", "lang", "n_chars"), col("doc_id"), f)
      .groupBy("lang").agg(
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("n_chars") < 150, 1L).otherwise(0L)).as("n_blocked"))
      .orderBy("lang")
  }

  /** Bigram language-model quality score — the integer-arithmetic shape of
    * perplexity filtering (CCNet/C4-style: score each document by how
    * typical its token transitions are corpus-wide, then filter the
    * tail). Corpus model: conditional bigram frequency in ppm,
    * `ppm(w1→w2) = count(w1 w2)·10⁶ div count(w1 as prefix)`; per-doc
    * score = integer mean ppm over the doc's bigram INSTANCES. All-integer
    * (a float log-prob would hash-diverge across engines' libm) and
    * order-equivalent to mean log-likelihood for ranking typical vs
    * atypical docs at a fixed length.
    *
    * Scale: two corpus-wide count aggs (bigram, prefix) + one ppm join,
    * then one shuffle of doc-bigram instances against the ppm table —
    * partial+final aggs throughout. The model side's join strategy is
    * AQE-decided by default and PINNABLE via the session conf
    * `spark.graft.modelHint` (the `vocabHint` pattern): `broadcast`
    * promises the bigram model is dictionary-sized and forces the
    * map-side plan; `shuffle` promises it is web-scale and forces the
    * shuffle-hash plan on w1/w2 — both gated in OperatorSpec, results
    * identical either way (hints move the exchange, not the arithmetic).
    * Int64 bounds: per-doc sums are
    * ppm ≤ 10⁶ × doc length — safe at any corpus size — but the MODEL
    * side computes `bcnt · 10⁶`, which wraps once a single bigram's
    * corpus count exceeds 2⁶³/10⁶ ≈ 9.2·10¹². A 100 TB corpus holds
    * ~2·10¹³ tokens, so even a boilerplate bigram at 5% frequency (10¹²)
    * sits ~10× under the bound (same operating envelope as q46's ppm);
    * past ~1 PB, shrink the ppm factor or route the product through
    * DECIMAL(38,0) on both engines — the ranking is unchanged.
    */
  /** q57's model + scoring as reusable oracle CTEs, ending in
    * `lm(doc_id, n_bigrams, lm_score)` — shared with the perplexity-split
    * gate ([[TierSixteen.q113]]), whose oracle restates the same corpus LM. */
  private[operators] val lmCtes: String =
    """tl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |  FROM documents),
      |big AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(len(l)-1), k -> l[k+1])) AS w1,
      |         unnest(list_transform(range(len(l)-1), k -> l[k+2])) AS w2
      |  FROM tl WHERE len(l) >= 2),
      |ucnt AS (SELECT w1, count(*) AS ucnt FROM big GROUP BY 1),
      |bcnt AS (SELECT w1, w2, count(*) AS bcnt FROM big GROUP BY 1, 2),
      |ppm AS (SELECT w1, w2, (bcnt * 1000000) // ucnt AS ppm
      |        FROM bcnt JOIN ucnt USING (w1)),
      |lm AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |         CAST(sum(ppm) // count(*) AS BIGINT) AS lm_score
      |  FROM big JOIN ppm USING (w1, w2)
      |  GROUP BY doc_id)""".stripMargin

  val q57 = Q("q57_bigram_lm",
    s"""WITH $lmCtes
       |SELECT doc_id, n_bigrams, lm_score FROM lm ORDER BY doc_id""".stripMargin) {
    (s, dir) => lmScores(s, dir).orderBy("doc_id")
  }

  /** q57's scored corpus as a reusable frame — `(doc_id, n_bigrams,
    * lm_score)`, unordered; documents with fewer than two tokens carry no
    * bigram and are absent. */
  private[operators] def lmScores(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val big = Tables.load(s, dir, "documents")
      .select(col("doc_id"), filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("l")) - 2),
          k => struct(element_at(col("l"), k + 1).as("w1"),
            element_at(col("l"), k + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist() // model counts AND per-doc scoring read it
    // model-side join pin: both the model-build join (bcnt ⋈ ucnt) and the
    // scoring join (big ⋈ ppm) carry the same model-size promise
    val hint = s.conf.getOption("spark.graft.modelHint").map(_.toLowerCase)
    def pinned(model: org.apache.spark.sql.DataFrame) = hint match {
      case Some("broadcast") => broadcast(model)
      case Some("shuffle")   => model.hint("shuffle_hash")
      case _                 => model
    }
    val ucnt = big.groupBy("w1").agg(count(lit(1)).as("ucnt"))
    val bcnt = big.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
    val ppm = bcnt.join(pinned(ucnt), "w1")
      .select(col("w1"), col("w2"), expr("bcnt * 1000000 div ucnt").as("ppm"))
    big.join(pinned(ppm), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), expr("sum(ppm) div count(1)").as("lm_score"))
  }

  /** The FULL dedup pipeline as one oracle-checked action —
    * [[Dedup.deduplicate]]'s composition: exact dedup first (the
    * degenerate-bucket mitigation ordering), MinHash+LSH pairs over the
    * distinct corpus, connected components, keep each cluster's min
    * doc_id. Output: per-language corpus shrinkage. Stricter than q53's
    * pairwise drop — a document whose only near-dups are LARGER ids still
    * drops here when its CLUSTER contains a smaller doc (chained
    * similarity), which is the production semantics ("one survivor per
    * duplicate family"). Both are declared, so the oracle pins the
    * difference externally.
    */
  val q58 = Q("q58_dedup_cluster_apply",
    s"""WITH RECURSIVE
       |exact_surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
       |corpus AS (
       |  SELECT d.doc_id, d.text FROM documents d JOIN exact_surv USING (doc_id)),
       |pairs AS (${TierFour.minhashSql("corpus")}),
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT doc_id AS id FROM corpus),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id WHERE r.lbl < e.v),
       |lab AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |keep AS (SELECT min(id) AS doc_id FROM lab GROUP BY lbl)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM keep)
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val kept = Dedup.deduplicate(docs).select("doc_id").withColumn("kept", lit(1))
    docs.join(kept, Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept").isNotNull, 1L).otherwise(0L)).as("n_survivors"))
      .orderBy("lang")
  }

  /** SimHash near-duplicate JOIN — the missing half of q27, and the
    * web-scale dedup of Manku, Jain & Das Sarma ("Detecting Near-Duplicates
    * for Web Crawling", WWW'07): find all pairs within Hamming distance 3
    * over the 63-bit signatures. Banding by PIGEONHOLE, not probability:
    * the signature splits into 4 chunks (16/16/16/15 bits), and distance
    * ≤ 3 forces at least one chunk to match exactly — so chunk-equality
    * candidates have PERFECT recall (unlike MinHash-LSH's S-curve), and
    * verification is one codegen'd `bit_count(sa ^ sb)` per candidate.
    *
    * Scale: the chunk value is the shuffle key (candidates are a bucket
    * self-join, never all-pairs); the 8-byte signature rides the postings
    * so pairs exit the join verification-ready (q26's zero-attach-join
    * pattern); each pair is emitted from its FIRST matching chunk — the
    * earlier-chunks-differ predicate is pure integer codegen on the
    * carried signatures, so no distinct shuffle on the join output.
    */
  val q59 = Q("q59_simhash_pairs",
    s"""WITH sigs AS (${TierFour.simhashSelect}),
       |chunks AS (
       |  SELECT doc_id, simhash, j,
       |         (simhash >> (j*16)) & CASE WHEN j = 3 THEN 32767 ELSE 65535 END AS ck
       |  FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS j)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |         x.simhash AS sa, y.simhash AS sb
       |  FROM chunks x JOIN chunks y
       |    ON x.j = y.j AND x.ck = y.ck AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    hammingPairs(TierFour.simhashSigs(s, dir))
  }

  /** The pigeonhole banding scheme shared by [[hammingPairs]],
    * [[hammingScreen]] and [[hammingAdmit]] (and mirrored in q59/q73's
    * SQL): a 63-bit signature splits into 4 chunks of 16/16/16/15 bits,
    * so Hamming distance ≤ 3 forces at least one chunk to match exactly.
    * ONE definition — the exact-recall guarantee holds only while every
    * path bands identically. */
  private[operators] def chunk(c: org.apache.spark.sql.Column, j: Int): org.apache.spark.sql.Column =
    shiftrightunsigned(c, j * 16).bitwiseAND(lit(if (j == 3) 32767L else 65535L))

  /** A signature frame exploded to one row per (j, chunk-value) posting. */
  private def chunkPostings(sigs: org.apache.spark.sql.DataFrame,
      id: String, sig: String, j: String, ck: String): org.apache.spark.sql.DataFrame =
    sigs.select(col("doc_id").as(id), col("simhash").as(sig),
      posexplode(array((0 until 4).map(k => chunk(col("simhash"), k)): _*))
        .as(Seq(j, ck)))

  /** The banded Hamming pair join over any `(doc_id, simhash)` frame —
    * see [[q59]]'s scaladoc; SimhashPairSpec differentials it against
    * brute force on random signatures. */
  def hammingPairs(sigs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val chunks = chunkPostings(sigs, "doc_id", "simhash", "j", "ck")
    val x = chunks.select(col("doc_id").as("doc_a"), col("simhash").as("sa"),
      col("j"), col("ck"))
    val y = chunks.select(col("doc_id").as("doc_b"), col("simhash").as("sb"),
      col("j").as("j_b"), col("ck").as("ck_b"))
    // first-matching-chunk emission: for chunk j, all earlier chunks differ
    val earlierMatched = (0 until 3).map(k =>
      (col("j") > k) && chunk(col("sa"), k) === chunk(col("sb"), k)).reduce(_ || _)
    x.join(y, col("j") === col("j_b") && col("ck") === col("ck_b")
        && col("doc_a") < col("doc_b") && !earlierMatched)
      .withColumn("hamming", expr("cast(bit_count(sa ^ sb) as bigint)"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** The banded Hamming NEAR-DUP SCREEN — [[hammingPairs]]'s asymmetric
    * twin: check an INCOMING `(doc_id, simhash)` frame against a CORPUS
    * signature store, emitting `(doc_id, corpus_id, hamming)` for every
    * corpus signature within distance ≤ 3 (exact recall by the same
    * pigeonhole argument). No sort, no aggregation, no distinct — every
    * stage is stateless, so the SAME plan screens a live STREAM against a
    * static signature table (stream-static equi-join on the chunk key;
    * s21 parity-specs it against this batch form), closing the gap
    * between the batch dedup family and the streaming surface: s08 was
    * exact-hash only, this is near-dup. A re-ingested document matches
    * itself at distance 0 — the screen's "seen before" signal.
    *
    * Scale: the corpus side is the persisted signature store (8 bytes +
    * id per document — the [[SigIndex]] posture); the chunk value is the
    * join key, so candidates are bucket-joins, never all-pairs, and each
    * pair is emitted from its FIRST matching chunk (pure integer codegen
    * on the carried signatures — no dedup shuffle on the join output).
    *
    * PRECONDITION (the [[graft.functions.CountMin.probe]] convention):
    * each side must carry at most one row per (doc_id, simhash) —
    * the emit-once guarantee is per input-row PAIR, so duplicated input
    * rows emit duplicated pair rows (q73's oracle takes the DISTINCT
    * frame; a library caller feeding raw non-deduped frames should
    * `.distinct()` first).
    */
  def hammingScreen(incoming: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val x = chunkPostings(incoming, "in_id", "in_sig", "j", "ck")
    val y = chunkPostings(corpus, "corpus_id", "corpus_sig", "j_b", "ck_b")
    val earlierMatched = (0 until 3).map(k =>
      (col("j") > k) && chunk(col("in_sig"), k) === chunk(col("corpus_sig"), k))
      .reduce(_ || _)
    x.join(y, col("j") === col("j_b") && col("ck") === col("ck_b") && !earlierMatched)
      .withColumn("hamming", expr("cast(bit_count(in_sig ^ corpus_sig) as bigint)"))
      .filter(col("hamming") <= 3)
      .select(col("in_id").as("doc_id"), col("corpus_id"), col("hamming"))
  }

  /** The near-dup ADMISSION form of [[hammingScreen]] — returns the
    * incoming rows that have NO corpus signature within Hamming distance
    * ≤ 3, as FOUR chained stateless LEFT ANTI joins, one per pigeonhole
    * chunk: anti-join j drops every incoming row whose j-th chunk matches
    * a corpus posting within distance 3, so the survivors matched no chunk
    * — exactly "no corpus signature within 3" (pigeonhole). Each join is
    * a genuine EQUI-join (`chunk_j(simhash) = ck`, a computed key Catalyst
    * extracts — an earlier single-join form indexed the incoming chunks by
    * the corpus side's j and planned a BroadcastNestedLoopJoin, the
    * all-pairs shape this operator exists to avoid; plan-gated in
    * SimhashPairSpec now). Stream-static anti joins are supported, so this
    * is the drop-duplicates-at-the-door decision a live ingest makes per
    * document (s22 runs it inside the full admission pipeline); the
    * incoming side never explodes — one row in, one-or-zero rows out, no
    * re-grouping. `incoming` must carry a `simhash` column
    * ([[TextOps.simhashCol]] at ingest, or q27's batch build); other
    * columns pass through untouched. The corpus side is read once per
    * chunk (4 scans of the signature store — at scale, a store bucketed by
    * (j, ck) like [[SigIndex]]'s postings serves each as a pruned read).
    */
  def hammingAdmit(incoming: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    (0 until 4).foldLeft(incoming) { (admitted, j) =>
      val postings = corpus.select(col("simhash").as("corpus_sig"),
        chunk(col("simhash"), j).as("ck_b"))
      admitted.join(postings,
        chunk(admitted("simhash"), j) === col("ck_b")
          && bit_count(admitted("simhash").bitwiseXOR(col("corpus_sig"))) <= 3,
        "left_anti")
    }

  val all: Seq[Q] = Seq(q55, q56, q57, q58, q59)
}
