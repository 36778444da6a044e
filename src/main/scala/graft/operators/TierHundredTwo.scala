package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 102 (round 15): unseen-content rate between corpus slices and
  * the asymmetric set-similarity screen Jaccard can't express.
  *
  *  - q283: BIGRAM NOVELTY RATE — of the distinct word bigrams in the
  *    odd-doc_id half of the corpus, what fraction never occurs in the
  *    even half? The split-level twin of q262's Good–Turing (which
  *    prices the next TOKEN) and q282's Chao1 (which sizes the unseen
  *    vocabulary): this is the "how much genuinely new content does
  *    the next crawl bring" readout that decides whether more data is
  *    worth the compute. Exact distinct counts, ppm by integer
  *    division; an empty test half is the declared −1.
  *  - q284: CONTAINMENT NEAR-DUP PAIRS — `C = |A∩B| / min(|A|,|B|)`
  *    over bigram shingle sets at C ≥ 0.9. Containment catches what
  *    q28's Jaccard ≥ 0.8 is BLIND to by construction: a short document
  *    quoted whole inside a long one has J ≈ |A|/|B| (tiny) but C ≈ 1 —
  *    the quote-inclusion / boilerplate-envelope duplication class
  *    (Broder's containment, SEQUENCES'97). Qualification and ppm are
  *    exact-integer (`10·i ≥ 9·min`, `10⁶·i // min`).
  *
  * Scale, q284: the prefix-filter join is ASYMMETRIC, which is the
  * whole trick — C ≥ t with `|A| ≤ |B|` forces a shared shingle into
  * A's `⌊(1−t)·|A|⌋ + 1` RAREST shingles (rarest-first dense ids — the
  * q28 machinery), so candidates come from prefix(smaller) ⋈
  * full(other) on rare sids only; hot shingles have high ids and never
  * enter a prefix, so the skew never reaches the join. Verification is
  * one `array_intersect` per candidate. q283 is two distinct-aggregates
  * and a broadcast-able left-anti join on the shingle key.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star dedup /
  * corpus-analysis ops.
  */
object TierHundredTwo {

  /** Distinct `(doc_id, shingle)` word bigrams of a documents frame. */
  private[graft] def bigramsOf(docs: DataFrame): DataFrame = {
    val arr = docs.select(col("doc_id"),
      filter(split(col("text"), " "), x => x =!= "").as("l"))
    // size(l) < 2 ⇒ no bigrams; guard BEFORE sequence() (q28's gotcha:
    // sequence(0, -1) descends and element_at throws)
    arr.filter(size(col("l")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("l")) - 2),
          k => concat_ws(" ",
            element_at(col("l"), k + 1), element_at(col("l"), k + 2))))
          .as("shingle"))
      .distinct()
  }

  /** Novelty readout over ANY `(doc_id, shingle)` frame and a
    * doc-id split predicate: one row
    * `(n_train, n_test, n_novel, novelty_ppm)`. */
  private[graft] def noveltyOver(sh: DataFrame): DataFrame = {
    val train = sh.filter(col("doc_id") % 2 === 0).select("shingle").distinct()
    val test = sh.filter(col("doc_id") % 2 === 1).select("shingle").distinct()
    val te = test.join(train.withColumn("seen", lit(1)),
        Seq("shingle"), "left")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    train.agg(count(lit(1)).as("n_train")).crossJoin(te)
      .select(col("n_train"), col("n_test"), col("n_novel"),
        expr("""CAST(CASE WHEN n_test = 0 THEN -1
                |     ELSE 1000000 * n_novel DIV n_test END AS BIGINT)"""
          .stripMargin).as("novelty_ppm"))
  }

  val q283 = Q("q283_bigram_novelty",
    """WITH arr AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(l) - 1),
      |      k -> l[k+1] || ' ' || l[k+2])) AS shingle FROM arr)),
      |tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
      |te AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 1),
      |m AS (SELECT
      |  (SELECT count(*) FROM tr) AS n_train,
      |  (SELECT count(*) FROM te) AS n_test,
      |  (SELECT count(*) FROM te WHERE shingle NOT IN (SELECT shingle FROM tr))
      |    AS n_novel)
      |SELECT CAST(n_train AS BIGINT) AS n_train,
      |       CAST(n_test AS BIGINT) AS n_test,
      |       CAST(n_novel AS BIGINT) AS n_novel,
      |       CAST(CASE WHEN n_test = 0 THEN -1
      |            ELSE 1000000 * n_novel // n_test END AS BIGINT) AS novelty_ppm
      |FROM m""".stripMargin) { (s, dir) =>
    noveltyOver(bigramsOf(Tables.load(s, dir, "documents")))
  }

  /** Build-once shared working set for the bigram-shingle family
    * (VERDICT r12 #1's amortization pattern, extended here in r15):
    * q28 (Jaccard), q283 (novelty), q284 (containment) and q290 (vocab
    * growth) all start from the SAME distinct `(doc_id, shingle)` frame,
    * and q28/q284 additionally build the identical rarest-first
    * sorted-sid arrays. A production corpus pipeline shingles once;
    * `graft.Bench` times this build as its own `a03_…` entry and each
    * consumer through its face (BenchFacesSpec pins face ≡ declared
    * query). `Verify` stays self-contained per query. */
  case class BigramArtifacts(sh: DataFrame, arrs: DataFrame) {
    /** Materialize both members so the full build cost lands in the
      * build entry and none of it on the first face. */
    def warm(): Unit =
      Seq(sh, arrs).foreach(_.write.format("noop").mode("overwrite").save())
    def release(): Unit = { arrs.unpersist(false); sh.unpersist(false) }
  }

  def bigramArtifacts(docs: DataFrame): BigramArtifacts = {
    val sh = bigramsOf(docs).persist()
    val arrs = TextOps.shingleArrays(sh).persist()
    BigramArtifacts(sh, arrs)
  }

  /** Containment pairs over ANY `(doc_id, shingle)` frame at
    * `C ≥ num/den`: `(doc_a, doc_b, containment_ppm)`, exact-integer
    * qualification, asymmetric prefix-filtered candidates. */
  private[graft] def containmentOver(s: SparkSession, sh0: DataFrame,
      num: Int, den: Int): DataFrame = {
    val sh = sh0.persist() // feeds the df rank AND the sid join
    val arrs = TextOps.shingleArrays(sh).persist()
    containmentOverArrs(arrs, num, den)
  }

  /** [[containmentOver]]'s candidate + verify stages over prebuilt
    * rarest-first arrays — the extracted face the shared-build bench
    * sweep drives with [[BigramArtifacts.arrs]]. */
  private[graft] def containmentOverArrs(arrs: DataFrame,
      num: Int, den: Int): DataFrame = {
    // C ≥ num/den with |A| ≤ |B| forces a shared sid into A's
    // n − ⌈num·n/den⌉ + 1 rarest; the prefix side is ALWAYS the
    // (potentially) smaller doc, the full side is everything. Both sides
    // posexplode so the join can apply the POSITIONAL filter (r15, the
    // TextOps.ppjoinCandidates argument adapted to containment): both
    // arrays share the rarest-first sort order, so a pair's GLOBALLY-
    // FIRST shared sid is the same element in both — at that row the
    // intersection is capped by the elements from the match onward,
    // min(np−pos_p, nf−pos_f); below ⌈num·np/den⌉ the pair cannot
    // qualify. The bound only LOOSENS toward earlier positions, so the
    // first-shared row of every qualifying pair always survives and
    // killing later rows is harmless — candidates drop ~8× (3.1M → 0.4M
    // measured at sf0.1) before the distinct + attach joins pay for
    // them. (An array-carrying single-join form was tried and REVERTED:
    // Catalyst pushes the i-verify filter into the join condition ahead
    // of the cheap predicates, evaluating array_intersect on every raw
    // match — the attach-join shape keeps the verify after the distinct
    // where it runs once per candidate.)
    val prefix = arrs.select(col("doc_id").as("pid"), col("n").as("np"),
        posexplode(expr(
          s"slice(sids, 1, cast(n - floor(($num * n + $den - 1) / $den) + 1 as int))"))
          .as(Seq("pos_p", "sid")))
    val full = arrs.select(col("doc_id").as("fid"), col("n").as("nf"),
      posexplode(col("sids")).as(Seq("pos_f", "sid_f")))
    val cand = prefix.join(full,
        col("sid") === col("sid_f")
          && (col("np") < col("nf")
            || (col("np") === col("nf") && col("pid") < col("fid")))
          && least(col("np") - col("pos_p"), col("nf") - col("pos_f")) * den
             >= col("np") * num)
      .select(least(col("pid"), col("fid")).as("doc_a"),
        greatest(col("pid"), col("fid")).as("doc_b"))
      .distinct()
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("sids").as("sa"),
        col("n").as("na")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("sids").as("sb"),
        col("n").as("nb")), "doc_b")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("i") * den >= least(col("na"), col("nb")) * num)
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(1000000 * i DIV least(na, nb) AS BIGINT)")
          .as("containment_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  val q284 = Q("q284_containment_pairs",
    """WITH arr AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(l) - 1),
      |      k -> l[k+1] || ' ' || l[k+2])) AS shingle FROM arr)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(1000000 * i // least(sa.n, sb.n) AS BIGINT) AS containment_ppm
      |FROM inter
      |JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      |WHERE 10 * i >= 9 * least(sa.n, sb.n)
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    containmentOver(s, bigramsOf(Tables.load(s, dir, "documents")),
      num = 9, den = 10)
  }

  val all: Seq[Q] = Seq(q283, q284)
}
