package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 104 (round 15): context-window economics and the shape of the
  * duplication tail.
  *
  *  - q287: SEQUENCE-PACKING AUDIT — per source, what a fixed
  *    context window (W = 512 whitespace tokens) costs to train on:
  *    docs that TRUNCATE (tokens > W), the bin-count LOWER BOUND
  *    `⌈Σtokens/W⌉` any packing scheme must meet, and the padding a
  *    naive one-doc-per-sequence layout wastes (`Σ (W − min(tok, W))`).
  *    The pad/truncate split is THE knob behind sequence-packing
  *    pipelines (concat-and-chunk vs pad: Raffel et al. 2020 §2.2
  *    discusses the packing trade); all quantities are exact Int64.
  *  - q288: CLUSTER-SIZE LOG₂ HISTOGRAM — the duplication tail of the
  *    q55 near-dup clusters, banded by power of two (band =
  *    ⌊log₂ size⌋): duplication cluster sizes are heavy-tailed in real
  *    crawls, and the tail band count is what decides dedup strategy
  *    (a 2¹⁰-member cluster is a boilerplate family, not a retouched
  *    article). The band is computed as `length(bin(size)) − 1` — bit
  *    length, NOT float log₂ (both engines agree bit for bit; a libm
  *    `log2` at a power-of-two boundary does not).
  *
  * Scale: q287 is one map-side token count + keyed agg. q288 rides the
  * dedup family's pair + connected-components machinery (banded LSH,
  * contraction rounds) and adds two keyed aggs on the labels.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus-prep /
  * dedup ops.
  */
object TierHundredFour {

  /** Tokens per context window for q287. */
  private[graft] val Window = 512L

  /** Packing audit over ANY `(src, tok)` doc-length frame: per source
    * `(src, n_docs, n_truncated, total_tokens, min_bins, pad_waste)`. */
  private[graft] def packingOver(dl: DataFrame, w: Long): DataFrame =
    dl.groupBy("src")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("tok") > w, 1L).otherwise(0L)).as("n_truncated"),
        sum(col("tok")).as("total_tokens"),
        sum(lit(w) - least(col("tok"), lit(w))).as("pad_waste"))
      .select(col("src"), col("n_docs"), col("n_truncated"),
        col("total_tokens"),
        expr(s"(total_tokens + ${w - 1}) div $w").as("min_bins"),
        col("pad_waste"))
      .orderBy("src")

  val q287 = Q("q287_packing_audit",
    s"""WITH dl AS (
       |  SELECT source AS src,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |           AS BIGINT) AS tok
       |  FROM documents)
       |SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN tok > $Window THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_truncated,
       |       CAST(sum(tok) AS BIGINT) AS total_tokens,
       |       CAST((sum(tok) + ${Window - 1}) // $Window AS BIGINT) AS min_bins,
       |       CAST(sum($Window - least(tok, $Window)) AS BIGINT) AS pad_waste
       |FROM dl GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    packingOver(Tables.load(s, dir, "documents")
      .select(col("source").as("src"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("tok")),
      Window)
  }

  /** Log₂ histogram over ANY `(id, lbl)` labels frame:
    * `(band, band_floor, n_clusters, n_docs)` for sizes ≥ 2, ordered —
    * band via bit length, never float log. */
  private[graft] def sizeHistogramOver(labels: DataFrame): DataFrame =
    labels.groupBy("lbl").agg(count(lit(1)).as("csize"))
      .filter(col("csize") >= 2)
      .select((length(bin(col("csize"))) - 1).cast("long").as("band"),
        col("csize"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_clusters"), sum(col("csize")).as("n_docs"))
      .select(col("band"), expr("CAST(shiftleft(1L, CAST(band AS INT)) AS BIGINT)")
          .as("band_floor"),
        col("n_clusters"), col("n_docs"))
      .orderBy("band")

  val q288 = Q("q288_cluster_size_bands",
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
       |cs AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize FROM lab GROUP BY 1),
       |b AS (
       |  SELECT CAST(length(bin(csize)) - 1 AS BIGINT) AS band, csize
       |  FROM cs WHERE csize >= 2)
       |SELECT band, CAST(1 << band AS BIGINT) AS band_floor,
       |       CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(sum(csize) AS BIGINT) AS n_docs
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    sizeHistogramOver(Components.connected(
      docs.select(col("doc_id").as("id")),
      TierFour.minhashPairs(TextOps.tok(s, dir))
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))))
  }

  val all: Seq[Q] = Seq(q287, q288)
}
