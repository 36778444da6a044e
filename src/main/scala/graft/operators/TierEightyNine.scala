package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 89 (round 13): two curation allocators — a punctuation-free
  * readability grade per source, and the exact proportional split of a
  * fixed sampling budget.
  *
  *  - q257: FORCAST READABILITY GRADE (Caylor–Sticht 1973) — the one
  *    classic readability formula with NO sentence-length term, which
  *    is exactly what machine-scale corpora need (the fixture — like
  *    much scraped text — has no reliable sentence punctuation; Flesch
  *    and FK would divide by a fiction). Grade = 20 − 15·(M/W) where
  *    M = monosyllabic words (exactly one vowel group — the standard
  *    mechanical syllable proxy) and W = words; kept in exact
  *    milli-units `20000 − (15000·M)//W` per source. Both engines
  *    count vowel groups with the same `[aeiou]+` extract-all — the
  *    q86/q84 regex-parity convention.
  *  - q258: LARGEST-REMAINDER APPORTIONMENT (Hamilton's method) —
  *    split a fixed budget of 1000 sample slots across sources
  *    proportional to character mass: `base = ⌊S·w/W⌋`, then the
  *    S − Σbase leftover slots go to the largest remainders
  *    (ties: source ascending — pinned). The exact-integer answer to
  *    "give every source its fair share AND make the total come out
  *    exactly S" that per-source rounding cannot deliver. Rank is
  *    computed by a broadcast pair count over the SOURCE AGGREGATE
  *    (never a single-partition global window — the q234 lesson),
  *    bounded by the grouping dimension.
  *
  * Scale: q257 is one token explode + keyed count, the regex codegen'd
  * per token. q258's pairwise rank is O(|sources|²) on a broadcast
  * metadata frame.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star curation ops.
  */
object TierEightyNine {

  /** Total slots q258 apportions. */
  private[graft] val Seats = 1000L

  val q257 = Q("q257_readability",
    """WITH tk AS (
      |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |f AS (
      |  SELECT source, doc_id,
      |         CASE WHEN len(regexp_extract_all(token, '[aeiou]+')) = 1
      |              THEN 1 ELSE 0 END AS mono
      |  FROM tk WHERE token <> ''),
      |g AS (
      |  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |         CAST(count(*) AS BIGINT) AS n_words,
      |         CAST(sum(mono) AS BIGINT) AS mono_words
      |  FROM f GROUP BY 1)
      |SELECT source, n_docs, n_words, mono_words,
      |       CAST((1000000 * mono_words) // n_words AS BIGINT) AS mono_ppm,
      |       CAST(20000 - (15000 * mono_words) // n_words AS BIGINT)
      |         AS grade_milli
      |FROM g ORDER BY source""".stripMargin) { (s, dir) =>
    readabilityOver(Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("token")))
  }

  /** q257's fold over ANY `(source, doc_id, token)` instance frame —
    * the extracted library face (`graft_readability` SQL twin). A
    * source with zero words cannot occur (the explode drops it). */
  private[graft] def readabilityOver(tk: DataFrame): DataFrame =
    tk.select(col("source"), col("doc_id"),
        when(size(regexp_extract_all(col("token"), lit("[aeiou]+"), lit(0)))
          === 1, 1L).otherwise(0L).as("mono"))
      .groupBy("source")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_words"),
        sum("mono").as("mono_words"))
      .select(col("source"), col("n_docs"), col("n_words"), col("mono_words"),
        expr("(1000000 * mono_words) div n_words").as("mono_ppm"),
        expr("20000 - (15000 * mono_words) div n_words").as("grade_milli"))
      .orderBy("source")

  val q258 = Q("q258_seat_allocation",
    s"""WITH w AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
       |q AS (
       |  SELECT source, w, ($Seats * w) // tw AS base, ($Seats * w) % tw AS rem
       |  FROM w CROSS JOIN tot),
       |l AS (SELECT CAST($Seats - sum(base) AS BIGINT) AS l FROM q),
       |r AS (
       |  SELECT a.source, CAST(1 + count(b.source) AS BIGINT) AS rk
       |  FROM q a LEFT JOIN q b
       |    ON (b.rem > a.rem) OR (b.rem = a.rem AND b.source < a.source)
       |  GROUP BY 1)
       |SELECT q.source, q.w AS w_chars, CAST(q.base AS BIGINT) AS base_seats,
       |       CAST(CASE WHEN r.rk <= l.l THEN 1 ELSE 0 END AS BIGINT) AS extra,
       |       CAST(q.base + CASE WHEN r.rk <= l.l THEN 1 ELSE 0 END AS BIGINT)
       |         AS seats
       |FROM q JOIN r ON r.source = q.source CROSS JOIN l
       |ORDER BY q.source""".stripMargin) { (s, dir) =>
    allocate(Tables.load(s, dir, "documents")
      .groupBy("source").agg(sum("n_chars").as("w")), Seats)
  }

  /** Hamilton largest-remainder apportionment of `seats` over ANY
    * `(source, w)` weight frame — the extracted library face
    * (`graft_allocation` SQL twin). Output
    * `(source, w_chars, base_seats, extra, seats)`; Σseats = `seats`
    * by construction (the law AllocationSpec pins). Remainder rank via
    * a broadcast pair count on the group aggregate — no global window. */
  private[graft] def allocate(w: DataFrame, seats: Long): DataFrame = {
    val tot = w.agg(sum("w").as("tw"))
    val q = w.crossJoin(broadcast(tot))
      .select(col("source"), col("w"),
        expr(s"($seats * w) div tw").as("base"),
        expr(s"($seats * w) % tw").as("rem"))
    val l = broadcast(q.agg((lit(seats) - sum("base")).as("l")))
    val b = q.select(col("source").as("src_b"), col("rem").as("rem_b"))
    val r = q.join(broadcast(b),
        col("rem_b") > col("rem") ||
          (col("rem_b") === col("rem") && col("src_b") < col("source")), "left")
      .groupBy("source").agg((lit(1L) + count(col("src_b"))).as("rk"))
    q.join(r, "source").crossJoin(l)
      .select(col("source"), col("w").as("w_chars"), col("base").as("base_seats"),
        when(col("rk") <= col("l"), 1L).otherwise(0L).as("extra"),
        (col("base") + when(col("rk") <= col("l"), 1L).otherwise(0L)).as("seats"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(q257, q258)
}
