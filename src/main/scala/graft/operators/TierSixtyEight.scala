package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 68 (round 11, seventeenth wave): the HLL register store in
  * action — "sketch once, roll up everywhere", the pre-aggregated
  * distinct-count architecture a 100 TB warehouse actually runs.
  *
  *  - q219: HLL WEEKLY ROLLUP — per-DAY HLL registers (the sketch
  *    store a daily ingest job writes: 64 longs per day) MERGED to
  *    week grain by one max-per-bucket fold, then q65's exact-integer
  *    estimate per week. max is associative, so the rollup is
  *    BIT-IDENTICAL to sketching the week's rows directly — and the
  *    oracle PROVES it cross-engine: DuckDB computes the direct
  *    per-week registers, Spark the day→week rollup, and the hash
  *    gate demands exact register/estimate equality. The `n_true`
  *    column is the verification side (q65 convention); a production
  *    rollup never rescans rows. Since round 12 the estimate readout
  *    applies HLL++'s small-range (linear-counting) branch — see
  *    [[LcEst]] — so small-n grains no longer ship the raw ~3.5×
  *    overestimate.
  *  - q220: ROLLING 7-DAY ACTIVES via HLL — q160's DOCUMENTED scale
  *    path, executed: each day's 64 registers contribute to its 7
  *    window-ends (a fixed ×7 expansion of REGISTER rows — 64·7 per
  *    day, not the user×day rows q160's exact form multiplies), merged
  *    per end-day and estimated. Exact `n_true` rides along and is
  *    LAW-pinned ≡ q160's exact answer; the estimate is gated inside
  *    raw-HLL's m=64 error envelope in the spec.
  *
  * Scale: both queries aggregate to ≤ 64 register rows per grain
  * before anything global happens (map-side max — the sketch is
  * mergeable by construction). The day→window explode multiplies 64
  * longs per day by 7, which at ANY corpus size is calendar-bounded
  * metadata — this is precisely why the sketch store exists. Hash and
  * ρ come from the single q65 definition ([[TierNine.hllWithH]] /
  * [[TierNine.hllRho]]) so the sketches cannot drift.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star sketch /
  * warehouse ops.
  */
object TierSixtyEight {

  import TierFour.{A0, B0, P}

  private def dayIdx = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")

  /** The per-day register store: (day, bucket, reg) — 64 longs per day. */
  private[graft] def dayRegisters(ev: DataFrame): DataFrame =
    TierNine.hllWithH(ev.select(col("user_id"), dayIdx.as("day")), col("user_id"))
      .select(col("day"), TierNine.hllBucket.as("bucket"), TierNine.hllRho.as("rho"))
      .groupBy("day", "bucket").agg(max("rho").as("reg"))

  /** HLL++'s SMALL-RANGE correction table (linear counting at m = 64):
    * `v` empty buckets → `round(64·ln(64/v), 6)` (Heule et al. 2013;
    * Whang et al. 1990's load-factor estimator). Precomputed to 6-dp
    * DECIMAL LITERALS shared VERBATIM by both engines — `ln` is a libm
    * call whose last bit is NOT guaranteed identical across engines, so
    * neither engine computes it at query time; with m = 64 the domain is
    * the 63 values v ∈ [1, 63], a lookup, not a function. (Closes the
    * round-11 VERDICT #6: raw registers overestimated ~3.5× at n ≈ 15.) */
  private[graft] val LcEst: IndexedSeq[(Int, Double)] =
    (1 to 63).map(v => v -> BigDecimal(64.0 * math.log(64.0 / v))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)

  /** The Spark-side LC lookup as a CASE over [[LcEst]]'s literals. */
  private def lcCaseSql: String =
    LcEst.map { case (v, e) => s"WHEN $v THEN CAST($e AS DOUBLE)" }
      .mkString("CASE v ", " ", " END")

  /** q65's exact-integer estimate fold per group over a (…, bucket,
    * reg) register frame: appends (r_max, s_scaled, est). The estimate
    * applies HLL++'s small-range branch: when the RAW estimate is
    * ≤ 2.5·m and at least one bucket is empty, report linear counting
    * ([[LcEst]]); otherwise the raw q65 estimate. Both branches and the
    * branch CONDITION are bit-identical cross-engine: the LC values are
    * shared literals, and the gate is evaluated in EXACT INTEGERS — no
    * float comparison whose last bit could flip the branch per engine.
    *
    * Gate derivation (exact rationals, then cleared of denominators):
    * `raw_est = (7213/10⁴)·(64000/65079)·4096·2^r_max / s_scaled ≤ 160`
    * ⇔ `7213·64000·4096·2^r_max ≤ 160·65079·10⁴·s_scaled`
    * ⇔ (÷64000)  `29544448·2^r_max ≤ 1626975·s_scaled`.
    * Int64 envelope: r_max ≤ 26 ⇒ LHS ≤ 29544448·2²⁶ ≈ 2·10¹⁵;
    * s_scaled ≤ 64·2²⁶ ⇒ RHS ≤ 7·10¹⁵ — both far under 2⁶³. */
  private[graft] def hllFold(regs: DataFrame, key: String): DataFrame = {
    val mx = regs.groupBy(col(key).as("mx_key"))
      .agg(max("reg").as("r_max"), count(lit(1)).as("nb"))
    regs.join(broadcast(mx), col(key) === col("mx_key"))
      .groupBy(key)
      .agg(first("r_max").as("r_max"), first("nb").as("nb"),
        sum(expr("shiftleft(cast(1 as bigint), r_max - reg)")).as("s_present"))
      .select(col(key), col("r_max").cast("long").as("r_max"),
        (col("s_present") + (lit(64) - col("nb")) *
          expr("shiftleft(cast(1 as bigint), r_max)")).cast("long").as("s_scaled"),
        (lit(64L) - col("nb")).cast("long").as("v"))
      .withColumn("raw_est",
        lit(0.7213) / (lit(1) + lit(1.079) / lit(64)) *
          (lit(4096) * expr("shiftleft(cast(1 as bigint), r_max)")) /
          col("s_scaled"))
      .withColumn("est",
        when(expr("29544448 * shiftleft(cast(1 as bigint), r_max)")
            <= expr("1626975 * s_scaled") && col("v") >= 1L, expr(lcCaseSql))
          .otherwise(round(col("raw_est"), 6)))
      .drop("raw_est", "v")
  }

  /** The HLL register-fold SQL tail shared by both oracles — expects a
    * CTE `r(<key>, bucket, reg)` and a true-count CTE `t(<key>, n_true)`;
    * mirrors [[hllFold]]'s small-range branch through the same [[LcEst]]
    * literals. */
  private def foldSql(key: String): String =
    s"""mx AS (SELECT $key, max(reg) AS r_max, CAST(count(*) AS BIGINT) AS nb
       |       FROM r GROUP BY 1),
       |sfold AS (
       |  SELECT r.$key, mx.r_max,
       |         CAST(sum(CAST(1 AS BIGINT) << (mx.r_max - reg))
       |              + (64 - mx.nb) * (CAST(1 AS BIGINT) << mx.r_max) AS BIGINT)
       |           AS s_scaled,
       |         CAST(64 - mx.nb AS BIGINT) AS v
       |  FROM r JOIN mx USING ($key) GROUP BY 1, 2, mx.nb),
       |lc AS (SELECT * FROM (VALUES
       |  ${LcEst.map { case (v, e) => s"($v, $e)" }.grouped(6)
             .map(_.mkString(", ")).mkString(",\n  ")})
       |  AS lct(v, est_lc))
       |SELECT CAST(sfold.$key AS BIGINT) AS $key,
       |       CAST(r_max AS BIGINT) AS r_max, s_scaled, n_true,
       |       CASE WHEN 29544448 * (CAST(1 AS BIGINT) << r_max)
       |                   <= 1626975 * s_scaled
       |                 AND sfold.v >= 1
       |            THEN CAST(lc.est_lc AS DOUBLE)
       |            ELSE round(0.7213 / (1 + 1.079/64)
       |                       * (4096 * (CAST(1 AS BIGINT) << r_max)) / s_scaled, 6)
       |       END AS est
       |FROM sfold JOIN t USING ($key)
       |LEFT JOIN lc ON lc.v = sfold.v ORDER BY $key""".stripMargin

  val q219 = Q("q219_hll_rollup",
    s"""WITH h0 AS (
       |  SELECT ((user_id % $P) * $A0 + $B0) % $P AS h0,
       |         epoch_us(ts) // 86400000000 // 7 AS week
       |  FROM events),
       |h AS (SELECT week, (h0 * h0) % $P AS h FROM h0),
       |r AS (SELECT week, h % 64 AS bucket,
       |             max(26 - (CASE WHEN h // 64 = 0 THEN 0
       |                            ELSE length(bin(h // 64)) END)) AS reg
       |      FROM h GROUP BY 1, 2),
       |t AS (SELECT epoch_us(ts) // 86400000000 // 7 AS week,
       |             CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
       |      FROM events GROUP BY 1),
       |${foldSql("week")}""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    // the day store rolls up — the oracle sketches the week DIRECTLY;
    // max-associativity makes the two bit-identical, and the hash gate
    // proves it cross-engine
    val merged = dayRegisters(ev)
      .groupBy(expr("day div 7").as("week"), col("bucket"))
      .agg(max("reg").as("reg"))
    val nTrue = ev.select(col("user_id"), dayIdx.as("day"))
      .groupBy(expr("day div 7").as("wk"))
      .agg(count_distinct(col("user_id")).as("n_true"))
    hllFold(merged, "week")
      .join(nTrue, col("week") === col("wk"))
      .select(col("week").cast("long").as("week"), col("r_max"),
        col("s_scaled"), col("n_true"), col("est"))
      .orderBy("week")
  }

  val q220 = Q("q220_rolling_active_hll",
    s"""WITH days AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events),
       |ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
       |win AS (SELECT days.day, ev.user_id
       |        FROM days JOIN ev ON ev.d BETWEEN days.day - 6 AND days.day),
       |h0 AS (SELECT day, ((user_id % $P) * $A0 + $B0) % $P AS h0 FROM win),
       |h AS (SELECT day, (h0 * h0) % $P AS h FROM h0),
       |r AS (SELECT day, h % 64 AS bucket,
       |             max(26 - (CASE WHEN h // 64 = 0 THEN 0
       |                            ELSE length(bin(h // 64)) END)) AS reg
       |      FROM h GROUP BY 1, 2),
       |t AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
       |      FROM win GROUP BY 1),
       |${foldSql("day")}""".stripMargin) { (s, dir) =>
    rollingActiveHll(Tables.load(s, dir, "events")).orderBy("day")
  }

  /** The q220 body over any events frame — exposed so the spec can gate
    * BOTH estimate regimes on constructed frames: a high-n ramp for the
    * raw branch, a small-n frame where [[LcEst]]'s linear-counting
    * branch fires (since round 12 — the fixture's tiny windows land
    * there, and now read near-exact instead of raw-HLL's ~3.5×
    * overestimate; the EXACT n_true column remains what the declared
    * query is judged by). */
  private[graft] def rollingActiveHll(ev: DataFrame): DataFrame = {
    val evDays = ev.select(dayIdx.as("d")).distinct()
    // ×7 expansion of REGISTER rows (64/day), never of user rows — the
    // q160 scale path; ends clipped to actual event days (q160 grid)
    val winRegs = dayRegisters(ev)
      .withColumn("d_end", explode(expr("sequence(day, day + 6)")))
      .join(evDays, col("d_end") === col("d"), "left_semi")
      .groupBy(col("d_end").as("day"), col("bucket"))
      .agg(max("reg").as("reg"))
    val nTrue = ev.select(col("user_id"), dayIdx.as("day"))
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("d_end"))
      .distinct()
      .join(evDays, col("d_end") === col("d"), "left_semi")
      .groupBy(col("d_end").as("nt_day"))
      .agg(count_distinct(col("user_id")).as("n_true"))
    hllFold(winRegs, "day")
      .join(nTrue, col("day") === col("nt_day"))
      .select(col("day").cast("long").as("day"), col("r_max"),
        col("s_scaled"), col("n_true"), col("est"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(q219, q220)
}
