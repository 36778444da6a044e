package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 15 (round 8, second wave): the remaining named production filters
  * and the scale-path closure for vector dedup.
  *
  *  - q106: the Gopher/MassiveText repetition-and-shape rule battery (Rae
  *    et al. 2021, table A1) as integer-exact per-document admission flags
  *    — the composite rule filter q31's scalar ratios feed in production.
  *  - q107: kNN majority-vote label propagation over the embedding table —
  *    the semi-supervised labeling step (classify unlabeled vectors by
  *    their neighbors) every curation pipeline runs after clustering.
  *  - q108: IVF-celled semantic near-dup CANDIDATE pairs — the production
  *    pair source q100's scaladoc promises ("the bucketed kNN-join path
  *    feeding the identical downstream"), now oracle-checked: Lloyd-cell
  *    blocking turns q35's O(n²) all-pairs into per-cell joins.
  *
  * Reference mapping: none (the reference stops at windowed tweet counts,
  * SURVEY.md §2.1); north-star LLM-pipeline ops.
  */
object TierFifteen {

  private val stop = Seq("the", "a", "of", "and", "to", "in")
  private val stopList = stop.map("'" + _ + "'").mkString(", ")

  /** Gopher-style rule battery, all-integer so both engines hash
    * identically (every ratio bound X/Y ≤ r is compared as X·den ≤ r·num·Y
    * in exact int64 — no division anywhere):
    *
    *   r_count:   50 ≤ n_tokens ≤ 100 000
    *   r_meanlen: 3 ≤ mean token length ≤ 10  (3n ≤ Σlen ≤ 10n)
    *   r_stop:    ≥ 2 distinct stopwords present
    *   r_ttr:     distinct tokens ≥ 30 % of tokens  (10·d ≥ 3·n)
    *   r_top:     top token ≤ 20 % of tokens  (5·max_tf ≤ n)
    *
    * admitted = every rule passes. Empty docs fail all rules.
    *
    * Scale: one (doc_id, token) shuffle — the per-(doc,token) counts and
    * every per-doc statistic fold in a single two-level aggregation with
    * map-side partials; the rule flags are codegen'd scalar arithmetic on
    * the 1-row-per-doc result. No window, no second corpus pass.
    */
  val q106 = Q("q106_gopher_rules",
    s"""WITH t AS (
       |  SELECT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE token <> ''),
       |tc AS (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
       |  FROM t GROUP BY 1, 2),
       |st AS (
       |  SELECT doc_id,
       |         CAST(sum(cnt) AS BIGINT) AS n,
       |         CAST(count(*) AS BIGINT) AS d,
       |         CAST(max(cnt) AS BIGINT) AS max_tf,
       |         CAST(sum(length(token) * cnt) AS BIGINT) AS chars,
       |         CAST(sum(CASE WHEN token IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
       |  FROM tc GROUP BY 1),
       |f AS (
       |  SELECT d.doc_id,
       |         coalesce(st.n, 0) AS n_tokens,
       |         CASE WHEN coalesce(st.n, 0) BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_count,
       |         CASE WHEN st.n IS NOT NULL
       |                AND 3 * st.n <= st.chars AND st.chars <= 10 * st.n
       |              THEN 1 ELSE 0 END AS r_meanlen,
       |         CASE WHEN coalesce(st.n_stop, 0) >= 2 THEN 1 ELSE 0 END AS r_stop,
       |         CASE WHEN st.n IS NOT NULL AND 10 * st.d >= 3 * st.n THEN 1 ELSE 0 END AS r_ttr,
       |         CASE WHEN st.n IS NOT NULL AND 5 * st.max_tf <= st.n THEN 1 ELSE 0 END AS r_top
       |  FROM documents d LEFT JOIN st USING (doc_id))
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(r_count AS BIGINT) AS r_count, CAST(r_meanlen AS BIGINT) AS r_meanlen,
       |       CAST(r_stop AS BIGINT) AS r_stop, CAST(r_ttr AS BIGINT) AS r_ttr,
       |       CAST(r_top AS BIGINT) AS r_top,
       |       CAST(r_count * r_meanlen * r_stop * r_ttr * r_top AS BIGINT) AS admitted
       |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    gopherFlags(docs).orderBy("doc_id")
  }

  /** The rule battery as a LIBRARY call over any `(doc_id, text, …)` frame
    * — `(doc_id, n_tokens, r_*, admitted)`, every input doc present. */
  def gopherFlags(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("cnt"))
    val st = tc.groupBy("doc_id").agg(
      sum(col("cnt")).as("n"),
      count(lit(1)).as("d"),
      max(col("cnt")).as("max_tf"),
      sum(length(col("token")) * col("cnt")).as("chars"),
      sum(when(col("token").isin(stop: _*), 1L).otherwise(0L)).as("n_stop"))
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    docs.select("doc_id").join(st, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        flag(coalesce(col("n"), lit(0L)).between(50L, 100000L)).as("r_count"),
        flag(col("n").isNotNull &&
          lit(3L) * col("n") <= col("chars") && col("chars") <= lit(10L) * col("n"))
          .as("r_meanlen"),
        flag(coalesce(col("n_stop"), lit(0L)) >= 2L).as("r_stop"),
        flag(col("n").isNotNull && lit(10L) * col("d") >= lit(3L) * col("n")).as("r_ttr"),
        flag(col("n").isNotNull && lit(5L) * col("max_tf") <= col("n")).as("r_top"))
      .withColumn("admitted",
        col("r_count") * col("r_meanlen") * col("r_stop") * col("r_ttr") * col("r_top"))
  }

  private val K = 5 // neighbors voting

  /** kNN majority-vote label propagation: every vector is classified by
    * the majority label of its 5 nearest neighbors (squared L2 via the dot
    * identity — exact doubles, element order pinned by
    * [[graft.expressions.DotProduct]]/`list_dot_product` on the two
    * engines; distance ties break on lower vec_id, vote ties on lower
    * label via one lexicographic `min(struct(-cnt, label))`). Output per
    * vector: true label, predicted label, correctness flag — the
    * label-quality audit (is the labeling consistent with embedding-space
    * geometry?) and the propagation step for unlabeled vectors.
    *
    * Scale: this is the brute-force EXACT anchor, same posture as q24/q35
    * — O(n²) candidate distances through a broadcast nested-loop join with
    * a codegen'd dot per pair, then a per-vector top-k window (partitioned
    * by vec_id — n·k rows sort per group, never globally). The 100 TB path
    * is the identical vote over [[TierEleven.knnJoin]]'s IVF-celled
    * neighbor lists (q85), validated against this output.
    */
  val q107 = Q("q107_knn_classify",
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
       |d AS (
       |  SELECT a.vec_id, b.vec_id AS nb, b.label AS nb_label,
       |         list_dot_product(a.e, a.e) - 2 * list_dot_product(a.e, b.e)
       |           + list_dot_product(b.e, b.e) AS d
       |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
       |top AS (
       |  SELECT vec_id, nb_label FROM (
       |    SELECT vec_id, nb_label,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, nb ASC) AS rk
       |    FROM d) WHERE rk <= $K),
       |votes AS (
       |  SELECT vec_id, nb_label, CAST(count(*) AS BIGINT) AS cnt
       |  FROM top GROUP BY 1, 2),
       |pred AS (
       |  SELECT vec_id, nb_label AS pred FROM (
       |    SELECT vec_id, nb_label,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cnt DESC, nb_label ASC) AS rk
       |    FROM votes) WHERE rk = 1)
       |SELECT v.vec_id, CAST(v.label AS BIGINT) AS label,
       |       CAST(p.pred AS BIGINT) AS pred,
       |       CAST(CASE WHEN v.label = p.pred THEN 1 ELSE 0 END AS BIGINT) AS correct
       |FROM v JOIN pred p USING (vec_id) ORDER BY vec_id""".stripMargin) { (s, dir) =>
    graft.expressions.GraftFunctions.register(s)
    def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
    val v = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("e"))
    // squared norms once per vector (O(n)); one codegen'd dot per pair
    val a = v.select(col("vec_id"), col("e").as("ea"))
      .withColumn("na2", dot(col("ea"), col("ea")))
    val b = v.select(col("vec_id").as("nb"), col("label").as("nb_label"), col("e").as("eb"))
      .withColumn("nb2", dot(col("eb"), col("eb")))
    val top = a.join(broadcast(b), col("vec_id") =!= col("nb"))
      .withColumn("d", col("na2") - lit(2) * dot(col("ea"), col("eb")) + col("nb2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d").asc, col("nb").asc)))
      .filter(col("rk") <= K)
    val pred = top.groupBy("vec_id", "nb_label")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("vec_id")
      .agg(min(struct(-col("cnt"), col("nb_label"))).as("m"))
      .select(col("vec_id"), col("m.nb_label").as("pred"))
    v.select("vec_id", "label").join(pred, "vec_id")
      .select(col("vec_id"), col("label"), col("pred"),
        when(col("label") === col("pred"), 1L).otherwise(0L).as("correct"))
      .orderBy("vec_id")
  }

  /** IVF-celled semantic near-dup CANDIDATE pairs — q100/q35's production
    * pair source made oracle-exact: assign every vector to its q67
    * Lloyd-trained cell, self-join WITHIN cells only, keep pairs at
    * cosine ≥ 0.45 (q35's threshold, identical exact-double math). The
    * cell is carried in the output so recall loss is auditable: a missing
    * q35 pair is exactly one whose endpoints straddle cells (spec-pinned).
    *
    * Scale: this is the plan that replaces the O(n²) anchor at 100 TB —
    * the join key is the cell id, so candidate volume drops from n²/2 to
    * Σ_c n_c²/2, and the shuffle moves each vector once (k×dim centroids
    * broadcast; the per-cell self-join shuffles on `cell`). With the
    * write-time cell-partitioned store ([[TierNine.ivfIndex]]) the shuffle
    * disappears entirely — both sides arrive cell-local.
    */
  val q108 = Q("q108_ivf_semantic_pairs",
    s"""WITH ${TierNine.lloydSql},
       |w AS (
       |  SELECT a1.vec_id, a1.cid, v.e FROM a1 JOIN v USING (vec_id)),
       |p AS (
       |  SELECT a.cid, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       |         list_dot_product(a.e, b.e) /
       |         (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
       |  FROM w a JOIN w b ON a.cid = b.cid AND a.vec_id < b.vec_id)
       |SELECT vec_id_a, vec_id_b, CAST(cid AS BIGINT) AS cell, round(c, 6) AS cos
       |FROM p WHERE c >= 0.45 ORDER BY vec_id_a, vec_id_b""".stripMargin) { (s, dir) =>
    ivfPairs(s, dir)
      .select(col("vec_id_a"), col("vec_id_b"), col("cell"), round(col("c"), 6).as("cos"))
      .orderBy("vec_id_a", "vec_id_b")
  }

  /** The q108 cell assignment — `(vec_id, cid)`, q67's Lloyd-trained
    * nearest centroid (shared with TierFifteenSpec's straddle audit). */
  private[graft] def cellAssignment(s: SparkSession, dir: String): DataFrame =
    TierNine.assignTo(TierNine.embOf(s, dir), TierNine.lloydCentroids(s, dir))

  /** q108's pair generator, unrounded — `(vec_id_a, vec_id_b, cell, c)`. */
  private[operators] def ivfPairs(s: SparkSession, dir: String): DataFrame = {
    def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
    val emb = TierNine.embOf(s, dir)
    val assigned = cellAssignment(s, dir)
      .join(emb, "vec_id")
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val a = assigned.select(col("cid").as("cell"), col("vec_id").as("vec_id_a"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cid").as("cell"), col("vec_id").as("vec_id_b"),
      col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("c", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("c") >= 0.45)
  }

  private val Iters = 3 // Lloyd updates

  /** Multi-iteration k-means TRAINING — q67's single Lloyd update run to
    * `Iters` rounds, the loop an IVF quantizer is actually trained with.
    * Between rounds the k×dim centroid table (a few KB at ANY corpus
    * size) is collected to the driver and re-emitted as a literal frame:
    * each round's plan starts from a fresh leaf, so lineage never
    * accumulates across iterations ([[graft.operators.Components]]'
    * truncation posture, here by bounded driver state instead of
    * checkpoint files) and every assignment pass is one broadcast +
    * map-side argmin over the embeddings. Per-dimension means re-round to
    * 6 dp each iteration ([[IvfStore.train]]'s cross-engine determinism
    * rule), so both engines walk identical centroid sequences. Output:
    * final cluster sizes with the dim-0 centroid component as the
    * convergence witness.
    */
  val q109 = Q("q109_kmeans_train",
    s"""WITH ${TierNine.lloydSql},
       |${lloydIterSql(2)},
       |${lloydIterSql(3)}
       |SELECT CAST(a3.cid AS BIGINT) AS cluster,
       |       CAST(count(*) AS BIGINT) AS csize,
       |       min(cent3.c[1]) AS c0
       |FROM a3 JOIN cent3 USING (cid)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = TierNine.embOf(s, dir)
    var cents = IvfStore.train(emb, 4) // update 1 (the q67/q70/IvfStore trainer)
    for (_ <- 2 to Iters) {
      val frozen = cents.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq.toDF("cid", "c")
      cents = IvfStore.step(emb, frozen)
    }
    val finalCents = cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val centDf = finalCents.toDF("cid", "c")
    TierNine.assignTo(emb, centDf)
      .groupBy("cid").agg(count(lit(1)).as("csize"))
      .join(finalCents.map { case (cid, c) => (cid, c.head) }.toDF("cid", "c0"), "cid")
      .select(col("cid").cast("long").as("cluster"), col("csize"), col("c0"))
      .orderBy("cluster")
  }

  /** Oracle-side Lloyd iteration `n`: means of `a{n-1}`'s assignment
    * (6-dp rounded), then re-assignment — the `cent`/`d1`/`a1` block of
    * [[TierNine.lloydSql]] templated per round. */
  private def lloydIterSql(n: Int): String =
    s"""cent$n AS (
       |  SELECT cid, list(round(av, 6) ORDER BY j) AS c FROM (
       |    SELECT p.cid, j.j, avg(v.e[j.j]) AS av
       |    FROM a${n - 1} p JOIN v USING (vec_id)
       |    CROSS JOIN (SELECT unnest(range(1, 65)) AS j) AS j
       |    GROUP BY 1, 2) GROUP BY cid),
       |d$n AS (
       |  SELECT vec_id, cid,
       |         list_dot_product(e, e) - 2 * list_dot_product(e, c)
       |           + list_dot_product(c, c) AS d
       |  FROM v CROSS JOIN cent$n),
       |a$n AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
       |    FROM d$n) WHERE rk = 1)""".stripMargin

  /** BPE ENCODE apply — the tokenizer-apply side of q99's training step:
    * the corpus's top-20 learned char-pair merges (q99's exact ranking,
    * weight desc then pair asc) applied to every document in rank order,
    * reporting per-doc symbol counts before/after and the compression
    * ratio in integer ppm.
    *
    * Encoding runs as a STATICALLY UNROLLED chain of 20 codegen'd
    * `regexp_replace` steps over a space-separated symbol string (words
    * joined by ` / ` so merges never cross a word boundary; `\b` guards
    * so a pattern never matches inside an already-merged multi-char
    * symbol — both engines' regex engines treat the ASCII word boundary
    * identically, and leftmost-first non-overlapping replacement is
    * exactly BPE's scan order). The merge table is collected once at plan
    * time (20 rows — the q105/q109 bounded-driver-read convention); the
    * encode itself is a zero-shuffle narrow projection, so it pipelines
    * at any corpus size. The only shuffle anywhere is q99's merge
    * LEARNING aggregation. Merge symbols are alphanumeric on this corpus;
    * a production build would `Pattern.quote` them.
    */
  val q110 = Q("q110_bpe_encode",
    raw"""WITH RECURSIVE
       |toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks WHERE w <> '' GROUP BY 1),
       |prs AS (
       |  SELECT substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b, f
       |  FROM wf, unnest(range(1, length(w))) AS t(i)),
       |merges AS (
       |  SELECT a, b, row_number() OVER (ORDER BY sum(f) DESC, a, b) AS rk
       |  FROM prs GROUP BY a, b
       |  QUALIFY rk <= 20),
       |prep AS (
       |  SELECT doc_id,
       |         array_to_string(list_transform(
       |           list_filter(string_split(text, ' '), w -> w <> ''),
       |           w -> array_to_string(string_split(w, ''), ' ')), ' / ') AS s0,
       |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_before
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, s0 AS s, 0 AS r FROM prep
       |  UNION ALL
       |  SELECT e.doc_id, regexp_replace(e.s, '\b' || m.a || ' ' || m.b || '\b', m.a || m.b, 'g'), e.r + 1
       |  FROM enc e JOIN merges m ON m.rk = e.r + 1
       |  WHERE e.r < 20),
       |fin AS (
       |  SELECT p.doc_id, p.n_before,
       |         CAST(CASE WHEN p.n_before = 0 THEN 0
       |              ELSE len(list_filter(string_split(e.s, ' '), x -> x <> '/')) END AS BIGINT) AS n_after
       |  FROM prep p JOIN enc e ON e.doc_id = p.doc_id AND e.r = 20)
       |SELECT doc_id, n_before, n_after,
       |       CAST(CASE WHEN n_before = 0 THEN 0
       |            ELSE n_after * 1000000 // n_before END AS BIGINT) AS ppm
       |FROM fin ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val merges = TierThirteen.q99.run(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    bpeEncodeCounts(Tables.load(s, dir, "documents"), merges).orderBy("doc_id")
  }

  /** The encode as a LIBRARY call: apply `merges` (rank order) to any
    * `(doc_id, text, …)` frame → `(doc_id, n_before, n_after, ppm)`. */
  def bpeEncodeCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(col("text"), " "), w => w =!= "")
    val s0 = concat_ws(" / ",
      transform(words, w => concat_ws(" ", filter(split(w, ""), c => c =!= ""))))
    val enc = merges.foldLeft(s0) { case (c, (a, b)) =>
      regexp_replace(c, "\\b" + a + " " + b + "\\b", a + b)
    }
    val nBefore = length(translate(col("text"), " ", "")).cast("long")
    docs.select(col("doc_id"), nBefore.as("n_before"), enc.as("enc"))
      .select(col("doc_id"), col("n_before"),
        when(col("n_before") === 0L, 0L)
          .otherwise(size(filter(split(col("enc"), " "), x => x =!= "/")).cast("long"))
          .as("n_after"))
      .withColumn("ppm",
        when(col("n_before") === 0L, 0L)
          .otherwise(expr("n_after * 1000000 div n_before")))
  }

  /** Token-distribution DRIFT between the train and valid splits — the
    * data-mix regression check run before every training launch: if the
    * deterministic split (q75's affine buckets) is healthy, per-token
    * rates agree; a skewed shard assignment or an upstream filter applied
    * to one split and not the other shows up as rate drift. Rates are
    * integer ppm of each split's token mass (`cnt·10⁶ div total` — no
    * floats), drift their signed difference; top-20 by |drift|.
    *
    * Scale: ONE (token) shuffle — the per-split counts fold as
    * conditional sums in a single aggregation; the two split totals ride
    * in on a broadcast single-row frame (the q46/q51 scalar-join
    * convention). The top-20 is a TakeOrdered over the vocabulary, never
    * the corpus.
    */
  val q111 = Q("q111_split_drift",
    s"""WITH s AS (
       |  SELECT CASE WHEN ((doc_id % ${TierFour.P}) * ${TierFour.A0} + ${TierFour.B0}) % ${TierFour.P} % 1000 < 980
       |              THEN 'train' ELSE 'valid' END AS split, text
       |  FROM documents
       |  WHERE ((doc_id % ${TierFour.P}) * ${TierFour.A0} + ${TierFour.B0}) % ${TierFour.P} % 1000 < 990),
       |t AS (
       |  SELECT split, token FROM (
       |    SELECT split, unnest(string_split(text, ' ')) AS token FROM s)
       |  WHERE token <> ''),
       |c AS (
       |  SELECT token,
       |         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |         CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
       |  FROM t GROUP BY 1),
       |tot AS (
       |  SELECT sum(n_train) AS t_train, sum(n_valid) AS t_valid FROM c),
       |r AS (
       |  SELECT token,
       |         CAST(n_train * 1000000 // t_train AS BIGINT) AS ppm_train,
       |         CAST(n_valid * 1000000 // t_valid AS BIGINT) AS ppm_valid
       |  FROM c, tot)
       |SELECT token, ppm_train, ppm_valid,
       |       ppm_train - ppm_valid AS drift_ppm
       |FROM r ORDER BY abs(ppm_train - ppm_valid) DESC, token ASC LIMIT 20""".stripMargin) { (s, dir) =>
    val bkt = ((col("doc_id") % TierFour.P) * TierFour.A0 + TierFour.B0) % TierFour.P % 1000
    val toks = Tables.load(s, dir, "documents")
      .filter(bkt < 990)
      .select(when(bkt < 980, "train").otherwise("valid").as("split"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("token"))
    val c = toks.groupBy("token").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "valid", 1L).otherwise(0L)).as("n_valid"))
    val tot = c.agg(sum("n_train").as("t_train"), sum("n_valid").as("t_valid"))
    c.join(broadcast(tot))
      .select(col("token"),
        expr("n_train * 1000000 div t_train").as("ppm_train"),
        expr("n_valid * 1000000 div t_valid").as("ppm_valid"))
      .withColumn("drift_ppm", col("ppm_train") - col("ppm_valid"))
      .orderBy(abs(col("drift_ppm")).desc, col("token").asc)
      .limit(20)
  }

  /** q107's vote over the IVF-CELLED candidate set — the production path
    * the brute-force anchor validates: each vector's 5 nearest among the
    * vectors of its own + runner-up Lloyd cell ([[TierEleven.probeAssign]],
    * q85's two-probe widening), then the identical majority vote. The
    * per-vector window sorts one-to-two CELLS' worth of candidates, never
    * n, so the whole plan is two cell-keyed shuffles at any corpus size.
    * `(vec_id, pred)`; agreement vs q107 measured and floored in
    * TierFifteenSpec.
    */
  private[graft] def cellVote(s: SparkSession, dir: String,
      probe2: Boolean = true, pins: Pins = new Pins): DataFrame = {
    def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
    val emb = TierNine.embOf(s, dir)
    val lbl = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("nb_label"))
    val cents = pins(TierNine.lloydCentroids(s, dir))
    val own = pins(TierNine.assignTo(emb, cents))
    val xs = TierEleven.probeAssign(emb, cents, own, probe2)
      .join(emb, "vec_id")
      .select(col("cid"), col("vec_id"), col("e").as("xe"))
      .withColumn("nx2", dot(col("xe"), col("xe")))
    val ys = own.join(emb, "vec_id").join(lbl, "vec_id")
      .select(col("cid"), col("vec_id").as("nb"), col("nb_label"), col("e").as("ye"))
      .withColumn("ny2", dot(col("ye"), col("ye")))
    xs.join(ys, Seq("cid"))
      .filter(col("vec_id") =!= col("nb"))
      .withColumn("d", col("nx2") - lit(2) * dot(col("xe"), col("ye")) + col("ny2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d").asc, col("nb").asc)))
      .filter(col("rk") <= K)
      .groupBy("vec_id", "nb_label")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("vec_id")
      .agg(min(struct(-col("cnt"), col("nb_label"))).as("m"))
      .select(col("vec_id"), col("m.nb_label").as("pred"))
  }

  val all: Seq[Q] = Seq(q106, q107, q108, q109, q110, q111)
}
