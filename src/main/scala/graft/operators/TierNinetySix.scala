package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 96 (round 14): blocked edit-distance entity resolution and the
  * classical standardized effect size.
  *
  *  - q271: EDIT-DISTANCE BLOCKED PAIRS — the entity-resolution screen
  *    the MinHash/LSH family doesn't cover: TYPO-class duplicates
  *    (ids, codes, names differing by a keystroke) live at edit
  *    distance 1-2, far below any shingle overlap an LSH band can see
  *    on short strings. Standard blocking discipline (Christen 2012):
  *    candidates share a block key — here (fixed-length) prefix-16 of
  *    the customer name — and only in-block pairs pay the O(len²)
  *    Levenshtein verify; the pair distribution by distance is the
  *    audit readout. Both engines ship the same classical DP
  *    `levenshtein` (Wagner–Fischer), so the verify is exact on both
  *    sides.
  *  - q272: COHEN'S d (Cohen 1988) between the q166 experiment arms on
  *    per-user revenue — the standardized mean difference every
  *    readout stack reports beside the rank tests (q194 U / CLES) and
  *    the robust uplifts (q199/q267): `d = (x̄_b − x̄_a) / s_pooled`.
  *    Moments are exact Int64 (n, Σx, Σx² per arm — Σx² ≤ n·x²_max ≈
  *    10⁴·10¹² = 10¹⁶ at sf0.1); the ratio is ONE shared
  *    double-expression tree evaluated from those exact integers in
  *    both engines (the Spearman rule: +,*,/ and sqrt are
  *    IEEE-identical — never ln/exp at query time). A non-positive
  *    pooled variance (degenerate arms) is DECLARED d = 0.
  *
  * Scale: q271's candidate join is an equi-join on the block key —
  * never all-pairs; block sizes are the blocking POLICY's knob, and the
  * per-distance counts are what an ER engineer tunes it with. q272
  * folds one per-user shuffle to six scalars.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star dedup /
  * experimentation ops.
  */
object TierNinetySix {

  /** Blocked Levenshtein pair distribution over ANY `(k, s)` frame
    * (block key, string): `(dist, n_pairs)` for 1 ≤ dist ≤ maxDist,
    * pairs canonical on s. */
  private[graft] def editBlockedOver(ks: DataFrame, maxDist: Int): DataFrame = {
    val a = ks.select(col("k"), col("s").as("sa"))
    val b = ks.select(col("k"), col("s").as("sb"))
    // thresholded Wagner–Fischer (levenshtein's 3-arg form, banded DP +
    // early exit — SPARK-44886): pairs beyond maxDist return −1 instead
    // of paying the full O(len²) table, and −1 is excluded by dist ≥ 1 —
    // which sa < sb already guarantees for every surviving pair, so the
    // output is bit-identical (TierNinetySixSpec pins the differential;
    // r15 bench: the verify stage reads 3.3× faster)
    a.join(b, Seq("k"))
      .filter(col("sa") < col("sb"))
      .select(levenshtein(col("sa"), col("sb"), maxDist).cast("long").as("dist"))
      .filter(col("dist") <= maxDist && col("dist") >= 1)
      .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
      .orderBy("dist")
  }

  val q271 = Q("q271_edit_blocked_pairs",
    """WITH c AS (SELECT substr(c_name, 1, 16) AS k, c_name AS s FROM customer)
      |SELECT CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist,
      |       CAST(count(*) AS BIGINT) AS n_pairs
      |FROM c a JOIN c b ON a.k = b.k AND a.s < b.s
      |WHERE levenshtein(a.s, b.s) <= 2
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    editBlockedOver(Tables.load(s, dir, "customer")
      .select(substring(col("c_name"), 1, 16).as("k"), col("c_name").as("s")),
      maxDist = 2)
  }

  /** Cohen's d over ANY `(arm, cents)` per-unit frame: one row
    * `(n_a, n_b, sum_a, sum_b, d_r6)` — exact Int64 moments, one shared
    * double tree for the ratio. */
  private[graft] def cohenDOver(um: DataFrame): DataFrame = {
    val m = um.groupBy()
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 0, col("cents") * col("cents")).otherwise(0L)).as("qa"),
        sum(when(col("arm") === 1, col("cents") * col("cents")).otherwise(0L)).as("qb"))
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      col("sa").as("sum_a"), col("sb").as("sum_b"),
      expr(
        """CASE WHEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
          |        + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) <= 0
          |     THEN CAST(0.0 AS DOUBLE)
          |     ELSE round((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
          |                 - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
          |       / sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
          |             + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
          |            / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)), 6)
          |END""".stripMargin).as("d_r6"))
  }

  val q272 = Q("q272_cohens_d",
    s"""WITH ${TierFiftyFive.armSql},
       |m AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |         CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS sa,
       |         CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS sb,
       |         CAST(sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS BIGINT) AS qa,
       |         CAST(sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS BIGINT) AS qb
       |  FROM um)
       |SELECT na AS n_a, nb AS n_b, sa AS sum_a, sb AS sum_b,
       |       CASE WHEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
       |               + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) <= 0
       |            THEN CAST(0.0 AS DOUBLE)
       |            ELSE round((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
       |                        - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
       |              / sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
       |                    + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
       |                   / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)), 6)
       |       END AS d_r6
       |FROM m""".stripMargin) { (s, dir) =>
    cohenDOver(TierFiftyFive.armRevenue(s, dir))
  }

  val all: Seq[Q] = Seq(q271, q272)
}
