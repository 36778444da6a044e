package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 58 (round 11, seventh wave): the EXPERIMENT-READOUT CAPSTONE.
  *
  *  - q200: one declared query emitting the readout page an experiment
  *    owner actually reads — eleven (metric, value) rows composing FIVE
  *    verified engines through their extracted library faces (the
  *    `Dedup.artifacts` sharing convention, so capstone and components
  *    cannot drift): q166's hi-value conversion χ² (via
  *    `TierFortyOne.armConversions` + `chi2Significant`), q194's
  *    Mann–Whitney CLES + significance (`TierFiftyFive.mwScalars` /
  *    `mwReport`), q196's BRR mean diff + Var + significance
  *    (`TierFiftySix.brrFromUm`), q198's CUPED adjusted diff + ρ²
  *    (`TierFiftySeven.cupedFromEvents`), and q199's trimmed-mean diff
  *    (`TierFiftySeven.trimmedC2`). Every component is its own
  *    oracle-checked declared query; the capstone's oracle re-derives
  *    all five chains in ONE WITH-clause and the spec pins capstone ≡
  *    components field by field. Scale posture = the components' own:
  *    each stage is one partial+final agg + a bounded driver closure;
  *    the event scan is shared lineage, nothing new shuffles.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierFiftyEight {

  val q200 = Q("q200_experiment_report",
    s"""WITH ${TierFiftyFive.armSql},
       |cvq AS (
       |  SELECT DISTINCT user_id FROM events
       |  WHERE event_type = 'purchase' AND floor(value * 100) >= ${TierFortyOne.HiCents}),
       |tq AS (
       |  SELECT u.arm, CAST(count(*) AS BIGINT) AS n_users,
       |         CAST(sum(CASE WHEN cvq.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_conv
       |  FROM u LEFT JOIN cvq ON cvq.user_id = u.user_id GROUP BY 1),
       |wq AS (
       |  SELECT max(CASE WHEN arm = 0 THEN n_conv END) AS a,
       |         max(CASE WHEN arm = 0 THEN n_users - n_conv END) AS b,
       |         max(CASE WHEN arm = 1 THEN n_conv END) AS c,
       |         max(CASE WHEN arm = 1 THEN n_users - n_conv END) AS d
       |  FROM tq),
       |gm AS (
       |  SELECT cents, CAST(count(*) AS BIGINT) AS cnt,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0v
       |  FROM um GROUP BY 1),
       |rkm AS (
       |  SELECT cents, cnt, n0v,
       |         CAST(coalesce(sum(cnt) OVER (ORDER BY cents
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre
       |  FROM gm),
       |scm AS (
       |  SELECT CAST(sum(n0v) AS BIGINT) AS n0,
       |         CAST(sum(cnt - n0v) AS BIGINT) AS n1,
       |         CAST(sum(n0v * (2 * pre + cnt + 1)) AS BIGINT) AS r02x
       |  FROM rkm),
       |reps AS (SELECT unnest(range(${TierFiftySix.Reps})) AS r),
       |hs AS (
       |  SELECT r, arm, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cents) AS BIGINT) AS s
       |  FROM um, reps WHERE ${TierFiftySix.selSql} = 1 GROUP BY 1, 2),
       |fl AS (
       |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cents) AS BIGINT) AS s
       |  FROM um GROUP BY 1),
       |th AS (
       |  SELECT r, CAST(sum(CASE WHEN arm = 1 THEN s * 100 END)
       |             // sum(CASE WHEN arm = 1 THEN n END)
       |           - sum(CASE WHEN arm = 0 THEN s * 100 END)
       |             // sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS th
       |  FROM hs GROUP BY 1),
       |t0 AS (
       |  SELECT CAST(sum(CASE WHEN arm = 1 THEN s * 100 END)
       |            // sum(CASE WHEN arm = 1 THEN n END)
       |          - sum(CASE WHEN arm = 0 THEN s * 100 END)
       |            // sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS th
       |  FROM fl),
       |vb AS (
       |  SELECT CAST(sum((th.th - t0.th) * (th.th - t0.th)) // ${TierFiftySix.Reps}
       |           AS BIGINT) AS var FROM th, t0),
       |d0c AS (SELECT min(epoch_us(ts) // 86400000000) AS m FROM events),
       |pxc AS (
       |  SELECT user_id,
       |         CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 < m + ${TierFiftySeven.SplitDays}
       |                       THEN floor(value * 100) ELSE 0 END) AS BIGINT) AS x,
       |         CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 >= m + ${TierFiftySeven.SplitDays}
       |                       THEN floor(value * 100) ELSE 0 END) AS BIGINT) AS y
       |  FROM events, d0c WHERE event_type = 'purchase' GROUP BY 1),
       |uxyc AS (
       |  SELECT arm, coalesce(x, 0) AS x, coalesce(y, 0) AS y
       |  FROM u LEFT JOIN pxc USING (user_id)),
       |scc AS (
       |  SELECT arm, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
       |         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
       |  FROM uxyc GROUP BY 1),
       |poolc AS (
       |  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(sx) AS HUGEINT) AS sx,
       |         CAST(sum(sy) AS HUGEINT) AS sy, CAST(sum(sxy) AS HUGEINT) AS sxy,
       |         CAST(sum(sxx) AS HUGEINT) AS sxx, CAST(sum(syy) AS HUGEINT) AS syy
       |  FROM scc),
       |cvc AS (
       |  SELECT nn * sxy - sx * sy AS covn, nn * sxx - sx * sx AS varn,
       |         nn * syy - sy * sy AS vyn FROM poolc),
       |amc AS (
       |  SELECT CAST(sum(CASE WHEN arm = 0 THEN n END) AS HUGEINT) AS n0,
       |         CAST(sum(CASE WHEN arm = 1 THEN n END) AS HUGEINT) AS n1,
       |         CAST(sum(CASE WHEN arm = 0 THEN sx END) AS HUGEINT) AS sx0,
       |         CAST(sum(CASE WHEN arm = 1 THEN sx END) AS HUGEINT) AS sx1,
       |         CAST(sum(CASE WHEN arm = 0 THEN sy END) AS HUGEINT) AS sy0,
       |         CAST(sum(CASE WHEN arm = 1 THEN sy END) AS HUGEINT) AS sy1
       |  FROM scc),
       |gt AS (
       |  SELECT arm, cents, CAST(count(*) AS BIGINT) AS cnt
       |  FROM um GROUP BY 1, 2),
       |rkt AS (
       |  SELECT arm, cents, cnt,
       |         sum(cnt) OVER (PARTITION BY arm ORDER BY cents) AS cum,
       |         sum(cnt) OVER (PARTITION BY arm) AS n
       |  FROM gt),
       |keptt AS (
       |  SELECT arm, cents,
       |         greatest(0, least(cum, n - n // 20)
       |                     - greatest(cum - cnt, n // 20)) AS kc
       |  FROM rkt),
       |tmt AS (
       |  SELECT arm, CAST(sum(cents * kc) * 100 // sum(kc) AS BIGINT) AS trim_c2
       |  FROM keptt GROUP BY 1)
       |SELECT metric, value FROM (
       |  SELECT 'n_users' AS metric, CAST(count(*) AS BIGINT) AS value FROM um
       |  UNION ALL SELECT 'conv_lift_ppm',
       |    CAST(max(CASE WHEN arm = 1 THEN (n_conv * 1000000) // n_users END)
       |       - max(CASE WHEN arm = 0 THEN (n_conv * 1000000) // n_users END)
       |      AS BIGINT) FROM tq
       |  UNION ALL SELECT 'conv_significant',
       |    CAST(CASE WHEN 100 * (a+b+c+d) * (a*d - b*c) * (a*d - b*c)
       |                   > 384 * (a+b) * (c+d) * (a+c) * (b+d)
       |         THEN 1 ELSE 0 END AS BIGINT) FROM wq
       |  UNION ALL SELECT 'mw_cles_ppm',
       |    CAST((r02x - n0 * (n0 + 1)) * 1000000 // (2 * n0 * n1) AS BIGINT) FROM scm
       |  UNION ALL SELECT 'mw_significant',
       |    CAST(CASE WHEN 30000 * (r02x - n0*(n0+1) - n0*n1)
       |                      * (r02x - n0*(n0+1) - n0*n1)
       |                   > 38415 * n0 * n1 * (n0 + n1 + 1)
       |         THEN 1 ELSE 0 END AS BIGINT) FROM scm
       |  UNION ALL SELECT 'mean_diff_c2', t0.th FROM t0
       |  UNION ALL SELECT 'boot_var_c2', vb.var FROM vb
       |  UNION ALL SELECT 'boot_significant',
       |    CAST(CASE WHEN 10000 * t0.th * t0.th > 38415 * vb.var
       |         THEN 1 ELSE 0 END AS BIGINT) FROM t0, vb
       |  UNION ALL SELECT 'cuped_adj_diff_c2',
       |    CAST(100 * ((sy1 * n0 - sy0 * n1) * varn - covn * (sx1 * n0 - sx0 * n1))
       |         // (n1 * n0 * varn) AS BIGINT) FROM amc, cvc
       |  UNION ALL SELECT 'cuped_rho2_ppm',
       |    CAST(1000000 * covn * covn // (varn * vyn) AS BIGINT) FROM cvc
       |  UNION ALL SELECT 'trimmed_diff_c2',
       |    CAST(max(CASE WHEN arm = 1 THEN trim_c2 END)
       |       - max(CASE WHEN arm = 0 THEN trim_c2 END) AS BIGINT) FROM tmt
       |) ORDER BY metric""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val um = TierFiftyFive.armRevenue(s, dir)
    val conv = TierFortyOne.armConversions(ev)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (n0c, c0) = conv(0L); val (n1c, c1) = conv(1L)
    val lift = c1 * 1000000L / n1c - c0 * 1000000L / n0c
    val convSig = TierFortyOne.chi2Significant(c0, n0c - c0, c1, n1c - c1)
    val (mn0, mn1, r02x) = TierFiftyFive.mwScalars(um)
    val (_, cles, mwSig) = TierFiftyFive.mwReport(mn0, mn1, r02x)
    val (bna, bnb, theta, varC2, bootSig) = TierFiftySix.brrFromUm(um)
    val (_, _, _, adj, _, rho2) = TierFiftySeven.cupedFromEvents(ev)
    val tm = TierFiftySeven.trimmedC2(um)
    Seq(
      ("boot_significant", bootSig),
      ("boot_var_c2", varC2),
      ("conv_lift_ppm", lift),
      ("conv_significant", convSig),
      ("cuped_adj_diff_c2", adj),
      ("cuped_rho2_ppm", rho2),
      ("mean_diff_c2", theta),
      ("mw_cles_ppm", cles),
      ("mw_significant", mwSig),
      ("n_users", bna + bnb),
      ("trimmed_diff_c2", tm(1L)._2 - tm(0L)._2))
      .toDF("metric", "value").orderBy("metric")
  }

  val all: Seq[Q] = Seq(q200)
}
