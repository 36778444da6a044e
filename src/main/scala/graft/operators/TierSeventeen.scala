package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 17 (round 8, fourth wave): example generation and schedule
  * planning — the steps between a curated corpus and a training run.
  *
  *  - q117: T5-style span corruption (Raffel et al. JMLR'20) — the
  *    (input, target) pair generator for denoising pretraining, with
  *    deterministic hash-seeded spans so both engines (and any retry)
  *    produce identical examples.
  *  - q118: mixture epoch planner — per-language repeat factors that
  *    reconcile the corpus's ACTUAL token shares with q91's
  *    temperature-sampling TARGET shares: the "how many epochs of each
  *    source" table a training launch is scheduled from.
  *
  * Reference mapping: none (SURVEY.md §2.1); north-star LLM-pipeline ops.
  */
object TierSeventeen {

  import TierFour.{A0, B0, P}

  /** Span-corruption core over an arbitrary `(doc_id, text)` frame — the
    * library/apply form (streamed per micro-batch in s31; corruption is
    * per-doc, so a stream corrupts statelessly batch by batch).
    *
    * Every position `p` (0-based over the doc's non-empty tokens) STARTS
    * a 3-token masked span iff `hash(doc_id, p) % 20 == 0` (~15 %
    * corruption at mean span 3 — T5's operating point, spans fixed-width
    * so integer arithmetic replaces its Poisson draw). Overlapping spans
    * merge into islands; each island becomes one `<extra_id_k>` sentinel
    * (k per doc, in position order). `input` is the doc with islands
    * replaced by their sentinel; `target` is sentinel-prefixed island
    * contents in order — so input + target reconstruct the doc exactly
    * (the round-trip law TierSeventeenSpec pins).
    *
    * Scale: ONE shuffle on doc_id — the three windows (start→masked via
    * a 2-PRECEDING max, island edge via lag, island index via running
    * sum) and the final fold all share the doc_id partitioning, and every
    * window is bounded by the doc, never the corpus. The rebuilds are
    * conditional collect_lists inside a single aggregation (q90's
    * rebuild convention). Int64: `doc_id·131071 + p` stays under 2⁶³ for
    * any doc_id < 7·10¹³.
    */
  private[graft] def spanCorrupt(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val rows = docs
      .select(col("doc_id"), filter(split(col("text"), " "), x => x =!= "").as("l"))
      .filter(size(col("l")) > 0)
      .select(col("doc_id"), posexplode(col("l")).as(Seq("p", "token")))
      .withColumn("st",
        when(expr(s"(((doc_id * 131071 + p) % $P) * $A0 + $B0) % $P % 20") === 0, 1).otherwise(0))
      .withColumn("masked", max(col("st")).over(byDoc.rowsBetween(-2, 0)))
      .withColumn("newspan",
        when(col("masked") === 1 && coalesce(lag(col("masked"), 1).over(byDoc), lit(0)) === 0, 1)
          .otherwise(0))
      .withColumn("span_id", sum(col("newspan")).over(byDoc))
      .withColumn("sentinel",
        concat(lit("<extra_id_"), (col("span_id") - 1).cast("string"), lit(">")))
    val folded = rows.groupBy("doc_id").agg(
      expr("array_join(transform(array_sort(collect_list(" +
        "CASE WHEN masked = 0 THEN named_struct('p', p, 'v', token) " +
        "     WHEN newspan = 1 THEN named_struct('p', p, 'v', sentinel) END)), x -> x.v), ' ')")
        .as("input"),
      expr("array_join(transform(array_sort(collect_list(" +
        "CASE WHEN masked = 1 THEN named_struct('p', p, 'v', " +
        "  CASE WHEN newspan = 1 THEN concat(sentinel, ' ', token) ELSE token END) END)), " +
        "x -> x.v), ' ')").as("target"),
      max(col("span_id")).cast("long").as("n_spans"),
      sum(col("masked")).cast("long").as("n_masked"))
    docs.select("doc_id").join(folded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("input"), lit("")).as("input"),
        coalesce(col("target"), lit("")).as("target"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
  }

  val q117 = Q("q117_span_corrupt",
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
       |  FROM documents),
       |tp AS (
       |  SELECT doc_id, unnest(range(0, len(l))) AS p, l FROM toks WHERE len(l) > 0),
       |t1 AS (
       |  SELECT doc_id, p, l[p + 1] AS token,
       |         CASE WHEN (((doc_id * 131071 + p) % $P) * $A0 + $B0) % $P % 20 = 0
       |              THEN 1 ELSE 0 END AS st
       |  FROM tp),
       |t2 AS (
       |  SELECT doc_id, p, token,
       |         max(st) OVER (PARTITION BY doc_id ORDER BY p
       |                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS masked
       |  FROM t1),
       |t3 AS (
       |  SELECT doc_id, p, token, masked,
       |         CASE WHEN masked = 1 AND coalesce(lag(masked) OVER (
       |                PARTITION BY doc_id ORDER BY p), 0) = 0
       |              THEN 1 ELSE 0 END AS newspan
       |  FROM t2),
       |t4 AS (
       |  SELECT doc_id, p, token, masked, newspan,
       |         sum(newspan) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
       |  FROM t3),
       |t5 AS (
       |  SELECT doc_id, p, token, masked, newspan,
       |         '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>' AS sentinel,
       |         span_id
       |  FROM t4),
       |f AS (
       |  SELECT doc_id,
       |         array_to_string(list(CASE WHEN masked = 0 THEN token ELSE sentinel END
       |           ORDER BY p) FILTER (WHERE masked = 0 OR newspan = 1), ' ') AS input,
       |         array_to_string(list(CASE WHEN newspan = 1 THEN sentinel || ' ' || token
       |                                   ELSE token END
       |           ORDER BY p) FILTER (WHERE masked = 1), ' ') AS target,
       |         CAST(max(span_id) AS BIGINT) AS n_spans,
       |         CAST(sum(masked) AS BIGINT) AS n_masked
       |  FROM t5 GROUP BY 1)
       |SELECT d.doc_id, coalesce(f.input, '') AS input, coalesce(f.target, '') AS target,
       |       coalesce(f.n_spans, 0) AS n_spans, coalesce(f.n_masked, 0) AS n_masked
       |FROM documents d LEFT JOIN f USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    spanCorrupt(Tables.load(s, dir, "documents").select("doc_id", "text"))
      .orderBy("doc_id")
  }

  /** Mixture EPOCH planner — per-language repeat factors reconciling the
    * corpus's actual token shares with q91's temperature targets
    * (p_l ∝ √n_l): `repeat_ppm = target_ppm · 10³ div actual_pk` is the
    * sampling rate (10⁶ = one epoch; above = upsample/repeat,
    * below = subsample) a data loader applies per language — the
    * schedule table of the Gopher/LLaMA-style mixes. Actual shares are
    * per-MILLE of token mass (`n_tokens·10³ div total` — the ·10³
    * factor keeps the product under int64 at any corpus size: 2·10¹³
    * tokens × 10³ ≈ 2·10¹⁶; a ppm numerator would overflow at ~10 % of
    * that scale). A language too small to register a single per-mille
    * point divides by zero → NULL in both engines — the planner's
    * honest "shard this language separately" signal.
    *
    * Scale: token counts are a narrow `size(filter(split))` projection
    * folded per language (|langs| rows, map-side partials, no explode);
    * the weight/total arithmetic is q91's broadcast one-row frame.
    */
  val q118 = Q("q118_epoch_plan",
    """WITH c AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT lang, n_docs, n_tokens,
      |         CAST(round(sqrt(n_docs) * 1000000) AS BIGINT) AS wt
      |  FROM c),
      |t AS (
      |  SELECT CAST(sum(wt) AS BIGINT) AS total_wt,
      |         CAST(sum(n_tokens) AS BIGINT) AS total_tok FROM w),
      |r AS (
      |  SELECT lang, n_docs, n_tokens,
      |         (wt * 1000000) // total_wt AS target_ppm,
      |         (n_tokens * 1000) // total_tok AS actual_pk
      |  FROM w CROSS JOIN t)
      |SELECT lang, n_docs, n_tokens,
      |       CAST(target_ppm AS BIGINT) AS target_ppm,
      |       CAST(actual_pk AS BIGINT) AS actual_pk,
      |       CAST((target_ppm * 1000) // actual_pk AS BIGINT) AS repeat_ppm
      |FROM r ORDER BY lang""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), " "), x => x =!= "")).cast("long")).as("n_tokens"))
    val w = c.withColumn("wt", round(sqrt(col("n_docs")) * 1000000).cast("long"))
    val t = w.agg(sum("wt").as("total_wt"), sum("n_tokens").as("total_tok"))
    w.crossJoin(broadcast(t))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("(wt * 1000000) div total_wt").as("target_ppm"),
        expr("(n_tokens * 1000) div total_tok").as("actual_pk"))
      .withColumn("repeat_ppm", expr("(target_ppm * 1000) div actual_pk"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(q117, q118)
}
