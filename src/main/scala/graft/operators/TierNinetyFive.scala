package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 95 (round 13): the inequality audit completed — two classical
  * concentration measures beside q169's Gini, each exact-integer.
  *
  *  - q269: HOOVER (ROBIN HOOD) INDEX over source character mass —
  *    the share of the corpus that would have to MOVE between sources
  *    to equalize them: `H = Σ|w_i/W − 1/n| / 2`, cross-multiplied to
  *    `10⁶·Σ|n·w_i − W| // (2·n·W)` — pure Int64 over the source
  *    aggregate. Gini answers "how unequal"; Hoover answers "how much
  *    rebalancing fixes it" — the number a shard planner actually uses.
  *  - q270: PALMA RATIO over per-user revenue — top-10 % mass over
  *    bottom-40 % mass (Palma 2011's alternative to Gini, insensitive
  *    to the middle): exact interval-clamp masses at the ⌊0.4n⌋ and
  *    ⌊0.9n⌋ rank cuts from value-grouped counts + ONE distributed
  *    prefix sum (the q267/q199 machinery — never a per-row window).
  *    Ties at the cut resolve by the clamp arithmetic itself (a value
  *    group straddling the cut contributes exactly its in-range count).
  *    A zero bottom mass is DECLARED ratio −1 (a sentinel, not ∞).
  *
  * Scale: q269 folds a |sources|-row aggregate; q270 is one per-user
  * shuffle + the two-pass prefix, bounded scalar reads.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star corpus /
  * product audit ops.
  */
object TierNinetyFive {

  /** Hoover index over ANY `(source, w)` weight frame — the extracted
    * library face. One row: `(n_groups, w_total, hoover_ppm)`. */
  private[graft] def hooverOver(w: DataFrame): DataFrame = {
    val tot = w.agg(count(lit(1)).as("n"), sum("w").as("tw"))
    w.crossJoin(broadcast(tot))
      .select(col("n"), col("tw"),
        abs(col("n") * col("w") - col("tw")).as("dev"))
      .groupBy("n", "tw").agg(sum("dev").as("sdev"))
      .select(col("n").as("n_groups"), col("tw").as("w_total"),
        expr("(1000000 * sdev) div (2 * n * tw)").as("hoover_ppm"))
  }

  val q269 = Q("q269_hoover_index",
    """WITH w AS (
      |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS tw
      |      FROM w)
      |SELECT t.n AS n_groups, t.tw AS w_total,
      |       CAST((1000000 * sum(abs(t.n * w.w - t.tw))) // (2 * t.n * t.tw)
      |            AS BIGINT) AS hoover_ppm
      |FROM w CROSS JOIN t GROUP BY t.n, t.tw""".stripMargin) { (s, dir) =>
    hooverOver(Tables.load(s, dir, "documents")
      .groupBy("source").agg(sum("n_chars").as("w")))
  }

  /** Palma masses over a per-user `(cents)` column: (n, bottom-40 %
    * mass, top-10 % mass) via value-grouped counts + one prefix sum. */
  private[graft] def palmaOver(um: DataFrame): DataFrame = {
    val s = um.sparkSession
    import s.implicits._
    val g = um.groupBy("cents").agg(count(lit(1)).as("cnt"))
    val rk = Cumulative.runningSum(s, g, Seq(col("cents")), col("cnt"), "cum")
    val nTot = g.agg(sum("cnt")).collect()(0).getLong(0) // one bounded scalar
    val k4 = 4 * nTot / 10
    val k9 = 9 * nTot / 10
    val m = rk
      .withColumn("kc_bot", greatest(lit(0L),
        least(col("cum"), lit(k4)) - greatest(col("cum") - col("cnt"), lit(0L))))
      .withColumn("kc_top", greatest(lit(0L),
        col("cum") - greatest(col("cum") - col("cnt"), lit(k9))))
      .agg(sum(col("cents") * col("kc_bot")).as("bot_mass"),
        sum(col("cents") * col("kc_top")).as("top_mass"))
      .collect()(0)
    val (bot, top) = (m.getLong(0), m.getLong(1))
    Seq((nTot, bot, top,
      if (bot == 0) -1L else 1000000L * top / bot))
      .toDF("n_users", "bot40_mass", "top10_mass", "palma_ppm")
  }

  val q270 = Q("q270_palma_ratio",
    s"""WITH ${TierFiftyFive.armSql},
       |g AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM um GROUP BY 1),
       |rk AS (
       |  SELECT cents, cnt,
       |         sum(cnt) OVER (ORDER BY cents) AS cum,
       |         sum(cnt) OVER () AS n
       |  FROM g),
       |m AS (
       |  SELECT any_value(n) AS n,
       |    CAST(sum(cents * greatest(0, least(cum, (4 * n) // 10)
       |                 - greatest(cum - cnt, 0))) AS BIGINT) AS bot_mass,
       |    CAST(sum(cents * greatest(0, cum
       |                 - greatest(cum - cnt, (9 * n) // 10))) AS BIGINT) AS top_mass
       |  FROM rk)
       |SELECT CAST(n AS BIGINT) AS n_users, bot_mass AS bot40_mass,
       |       top_mass AS top10_mass,
       |       CAST(CASE WHEN bot_mass = 0 THEN -1
       |            ELSE (1000000 * top_mass) // bot_mass END AS BIGINT)
       |         AS palma_ppm
       |FROM m""".stripMargin) { (s, dir) =>
    // the q194/q267 per-user revenue frame (arm column unused here)
    val ev = Tables.load(s, dir, "events")
    val users = ev.select("user_id").distinct()
    val rev = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(floor(col("value") * 100)).as("c"))
    palmaOver(users.join(rev, Seq("user_id"), "left")
      .select(coalesce(col("c"), lit(0L)).as("cents")))
  }

  val all: Seq[Q] = Seq(q269, q270)
}
