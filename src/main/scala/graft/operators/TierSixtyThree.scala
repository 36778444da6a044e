package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier 63 (round 11, twelfth wave): incremental view maintenance and
  * the least-squares trend — the additive-merge complement of q205 and
  * the first member of the regression family.
  *
  *  - q209: ADDITIVE IVM SNAPSHOT — incremental view maintenance for
  *    the abelian-group aggregates (count/sum with RETRACTIONS): each
  *    change row carries multiplicity m = ±1 (derived deterministically
  *    from `events`: `event_id % 13 = 0` → a retraction/cancellation,
  *    770 of 10 000 live at sf0.01), the maintained view is per-key
  *    (Σm, Σm·cents) with the IVM DELETE exactly when the state reaches
  *    the GROUP IDENTITY (both nets zero — deleting at count 0 alone
  *    would drop nonzero cents remnants and break the merge law).
  *    Where q205's LWW merge folds through an argmax SEMILATTICE (last
  *    writer wins, order matters), q209 folds through the GROUP (+) —
  *    deltas commute, so maintenance is one partial+final sum and
  *    [[maintain]] (yesterday's snapshot + today's delta, never a
  *    history replay) is a keyed outer merge + add + zero-filter.
  *    snapshot∘delta ≡ full fold law + the delete-at-zero branch
  *    spec-pinned (the fixture nets every key positive, so the spec
  *    constructs the zeroing delta — documented, not hidden).
  *  - q210: OLS TREND FIT — per event type over the daily-count grid:
  *    exact-integer least squares. One partial+final agg produces six
  *    Int64 scalars per type (n, Σx, Σy, Σxy, Σx², Σy²; x = day −
  *    min day, shared origin); the closure runs driver-side in BigInt
  *    (q198's convention — bounded by #types rows): slope_ppm =
  *    10⁶·(nΣxy−ΣxΣy) div (nΣx²−(Σx)²), icept_ppm = (10⁶·Σy −
  *    slope_ppm·Σx) div n, r2_ppm = 10⁶·num² div (den·(nΣy²−(Σy)²))
  *    — all truncating division, bit-identical across engines (q198
  *    verified the negative-numerator agreement). A constant series
  *    (vyn = 0) reports r2_ppm = 10⁶ (slope 0 fits it exactly).
  *    `spark.graft.trendDecimal=true` routes the in-plan moment sums
  *    through DECIMAL(38,0) past the Int64 envelope (wired in
  *    [[trendFit]], the q169 dispatch).
  *
  * Scale: q209 is ONE partial+final keyed sum — map-side combine eats
  * the retractions before the shuffle; `maintain` touches only keys
  * present in the delta plus the snapshot (one outer join, no replay).
  * q210's grid is calendar-bounded (#types × #days); the six-scalar agg
  * is partial+final with the same in-plan Int64 envelope note as q198
  * (Σx·y wraps past ~9·10¹⁸ — the q169 DECIMAL escape applies; the
  * BigInt closure itself has no envelope; the oracle's HUGEINT num²
  * holds to ~10¹⁹ per-term scale).
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star lakehouse /
  * analytics ops.
  */
object TierSixtyThree {

  /** The deterministic change stream: multiplicity m = −1 on every
    * 13th event id (a cancellation), +1 otherwise; seq = event_id
    * (q205's convention) orders nothing here — the group is
    * commutative — but carries the incremental split point. */
  private[graft] def ivmDeltaOf(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), col("event_id").as("seq"),
      when(col("event_id") % 13 === 0, lit(-1L)).otherwise(lit(1L)).as("m"),
      floor(col("value") * 100).cast("long").as("cents"))

  /** Fold a delta frame to the maintained view: per-key net count and
    * net cents, keys whose state is the GROUP IDENTITY (both nets zero)
    * DELETED — the IVM tombstone. Deleting exactly at the identity is
    * what keeps [[maintain]] exact: a missing row and a zero row merge
    * identically, whereas deleting at n_net = 0 alone would silently
    * drop a nonzero cents remnant. */
  private[graft] def ivmFold(delta: DataFrame): DataFrame =
    delta.groupBy("user_id")
      .agg(sum("m").as("n_net"),
        sum(col("m") * col("cents")).as("revenue_net_c"))
      .filter(col("n_net") =!= 0 || col("revenue_net_c") =!= 0)

  /** Incremental maintenance: yesterday's snapshot + today's delta →
    * today's snapshot, WITHOUT replaying history — one keyed outer
    * merge, adds, and the delete-at-zero filter. maintain(fold(≤cut),
    * delta(>cut)) ≡ fold(all) by commutativity (law spec-pinned). */
  private[graft] def maintain(snapshot: DataFrame, delta: DataFrame): DataFrame = {
    val d = ivmFold(delta)
      .withColumnRenamed("n_net", "dn").withColumnRenamed("revenue_net_c", "dc")
    snapshot.join(d, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n_net"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_net"),
        (coalesce(col("revenue_net_c"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("revenue_net_c"))
      .filter(col("n_net") =!= 0 || col("revenue_net_c") =!= 0)
  }

  val q209 = Q("q209_ivm_snapshot",
    """WITH d AS (
      |  SELECT user_id,
      |         CASE WHEN event_id % 13 = 0 THEN -1 ELSE 1 END AS m,
      |         CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT user_id, CAST(sum(m) AS BIGINT) AS n_net,
      |       CAST(sum(m * cents) AS BIGINT) AS revenue_net_c
      |FROM d GROUP BY 1
      |HAVING sum(m) <> 0 OR sum(m * cents) <> 0 ORDER BY 1""".stripMargin) { (s, dir) =>
    ivmFold(ivmDeltaOf(Tables.load(s, dir, "events"))).orderBy("user_id")
  }

  /** The daily-count grid per event type with the shared-origin x. */
  private[graft] def trendGrid(ev: DataFrame): DataFrame = {
    val dayIdx = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
    val g = ev.groupBy(col("event_type"), dayIdx.as("d"))
      .agg(count(lit(1)).as("y"))
    val mind = g.agg(min("d")).collect()(0).getLong(0) // bounded 1-row scalar
    g.select(col("event_type"), (col("d") - mind).as("x"), col("y"))
  }

  /** Exact-integer OLS per group: collect the six scalars per type
    * (bounded by #types) and close in BigInt — (type, n, slope_ppm,
    * icept_ppm, r2_ppm), truncating division throughout.
    *
    * Int64 envelope: the IN-PLAN moment sums (Σxy, Σx², Σy²) overflow
    * (loudly, ANSI) past ~9·10¹⁸ — y ≈ 3·10⁹ daily rows wraps Σy².
    * Session conf `spark.graft.trendDecimal=true` (the q169
    * `giniDecimal` dispatch exactly) routes the moment products and
    * sums through DECIMAL(38,0) — exact to ~10³⁸ — with the identical
    * BigInt closure and output schema; TierSixtyThreeSpec drives a
    * boundary fixture where the Int64 path throws and pins the decimal
    * path against BigInt. */
  private[graft] def trendFit(grid: DataFrame): Seq[(String, Long, Long, Long, Long)] = {
    val M = BigInt(1000000)
    val decimal = grid.sparkSession.conf.getOption("spark.graft.trendDecimal")
      .exists(_.equalsIgnoreCase("true"))
    def m(c: org.apache.spark.sql.Column) =
      if (decimal) c.cast("decimal(38,0)") else c
    grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(m(col("x"))).as("sx"), sum(m(col("y"))).as("sy"),
        sum(m(col("x")) * m(col("y"))).as("sxy"),
        sum(m(col("x")) * m(col("x"))).as("sxx"),
        sum(m(col("y")) * m(col("y"))).as("syy"))
      .collect().map { r =>
        def b(i: Int) =
          if (decimal) BigInt(r.getDecimal(i).toBigInteger)
          else BigInt(r.getLong(i))
        val n = BigInt(r.getLong(1))
        val (sx, sy, sxy, sxx, syy) = (b(2), b(3), b(4), b(5), b(6))
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx // > 0 for ≥2 distinct days
        val vyn = n * syy - sy * sy
        val slope = M * num / den
        val icept = (M * sy - slope * sx) / n
        val r2 = if (vyn == 0) M else M * num * num / (den * vyn)
        (r.getString(0), n.toLong, slope.toLong, icept.toLong, r2.toLong)
      }.toSeq.sortBy(_._1)
  }

  /** [[trendFit]] as a DataFrame — the library/SQL-twin face
    * (`graft_trend_fit`) over any (event_type, x, y) grid view. */
  private[graft] def trendFitDf(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    trendFit(grid).toDF("event_type", "n_days", "slope_ppm", "icept_ppm", "r2_ppm")
  }

  val q210 = Q("q210_trend_fit",
    """WITH g AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |mo AS (SELECT min(d) AS mind FROM g),
      |gx AS (SELECT event_type, CAST(d - mind AS HUGEINT) AS x,
      |              CAST(y AS HUGEINT) AS y FROM g, mo),
      |sc AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |              sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |              sum(x * x) AS sxx, sum(y * y) AS syy
      |       FROM gx GROUP BY 1),
      |cv AS (SELECT event_type, n, sx, sy,
      |              n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
      |              n * syy - sy * sy AS vyn FROM sc),
      |sl AS (SELECT *, 1000000 * num // den AS slope_ppm FROM cv)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |       CAST(slope_ppm AS BIGINT) AS slope_ppm,
      |       CAST((1000000 * sy - slope_ppm * sx) // n AS BIGINT) AS icept_ppm,
      |       CAST(CASE WHEN vyn = 0 THEN 1000000
      |                 ELSE 1000000 * num * num // (den * vyn) END AS BIGINT)
      |         AS r2_ppm
      |FROM sl ORDER BY event_type""".stripMargin) { (s, dir) =>
    trendFitDf(trendGrid(Tables.load(s, dir, "events")))
  }

  val all: Seq[Q] = Seq(q209, q210)
}
