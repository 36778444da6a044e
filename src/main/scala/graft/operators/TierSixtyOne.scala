package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier 61 (round 11, tenth wave): lakehouse ingestion ops — CDC merge
  * and the classic retention triangle.
  *
  *  - q205: CDC LAST-WRITER-WINS MERGE — the `MERGE INTO` core every
  *    lakehouse table maintenance job runs: a change stream of keyed
  *    upserts and delete tombstones folds to the current snapshot. The
  *    driver tables carry no op codes, so the query DERIVES a CDC
  *    stream from `events` deterministically (the q84/q119 in-query
  *    injection convention, declared identically in both engines):
  *    key = `user_id`, seq = `event_id` (globally unique — ties
  *    impossible by construction), op = 'D' on `event_id % 11 = 0`
  *    else 'U', payload = (`event_type`, cents of `value`). Both
  *    branches are live on the fixture: 16 of 150 keys end on a
  *    tombstone and vanish from the snapshot.
  *  - q206: RETENTION MATRIX WITH RATES — q88's day-grain events matrix
  *    completed as the product-analytics triangle: customers bucketed
  *    by first-order month, distinct-active counts per (cohort,
  *    month-offset), plus the cohort-size column and the exact-ppm
  *    retention RATE q88's raw counts lack. Orders (1500 customers over
  *    ~80 months) give real decay; `events` was probed degenerate
  *    (every user active every week — a rate column there would be a
  *    constant 10⁶).
  *
  * Scale: q205 is ONE partial+final struct-argmax aggregation keyed by
  * the CDC key — max(struct(seq, …)) combines map-side, no window, no
  * sort; [[merge]] gives the incremental form (yesterday's snapshot +
  * today's delta, never a history replay — MergeSpec pins
  * snapshot∘delta ≡ full fold). q206 is two partial+final aggs plus one
  * key-shuffled join on the entity and one broadcast join on the
  * cohort-sized (≤ #months) size table; `distinct` on (entity, month)
  * combines map-side. Nothing rescans history per cohort.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star lakehouse /
  * product-analytics ops.
  */
object TierSixtyOne {

  /** The derived CDC op stream: `(user_id, seq, op, event_type, val_c)`.
    * Deterministic injection — `event_id` is the total order (unique),
    * `% 11 = 0` rows are delete tombstones. */
  private[graft] def cdcOps(events: DataFrame): DataFrame =
    events.select(
      col("user_id"), col("event_id").as("seq"),
      when(col("event_id") % 11 === 0, lit("D")).otherwise(lit("U")).as("op"),
      col("event_type"),
      floor(col("value") * 100).cast("long").as("val_c"))

  /** Last-writer-wins fold of a CDC op frame to its current snapshot:
    * per key keep the max-seq op, drop keys whose last op is a
    * tombstone. One partial+final struct-argmax; seq must be unique per
    * key (callers derive it from a total order). */
  private[graft] def lwwMerge(ops: DataFrame): DataFrame =
    ops.groupBy("user_id")
      .agg(max(struct(col("seq"), col("op"), col("event_type"), col("val_c")))
        .as("m"))
      .filter(col("m.op") =!= "D")
      .select(col("user_id"), col("m.seq").as("last_seq"),
        col("m.event_type").as("event_type"), col("m.val_c").as("val_c"))

  /** INCREMENTAL merge: yesterday's snapshot + today's delta ops → the
    * new snapshot, without replaying history. Snapshot rows re-enter
    * the fold as 'U' ops at their recorded seq; correctness requires
    * every delta seq for a key to exceed that key's snapshot seq (CDC
    * streams are ordered — MergeSpec pins merge ≡ the full fold,
    * including delete-then-absent and delete-after-snapshot keys). */
  def merge(snapshot: DataFrame, delta: DataFrame): DataFrame =
    lwwMerge(snapshot.select(col("user_id"), col("last_seq").as("seq"),
        lit("U").as("op"), col("event_type"), col("val_c"))
      .unionByName(delta))

  val q205 = Q("q205_cdc_merge",
    """WITH c AS (
      |  SELECT user_id, event_id AS seq,
      |         CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op,
      |         event_type, CAST(floor(value * 100) AS BIGINT) AS val_c
      |  FROM events),
      |mx AS (SELECT user_id, max(seq) AS seq FROM c GROUP BY 1)
      |SELECT c.user_id, c.seq AS last_seq, c.event_type, c.val_c
      |FROM c JOIN mx ON mx.user_id = c.user_id AND mx.seq = c.seq
      |WHERE c.op <> 'D' ORDER BY c.user_id""".stripMargin) { (s, dir) =>
    lwwMerge(cdcOps(Tables.load(s, dir, "events"))).orderBy("user_id")
  }

  val q206 = Q("q206_retention_matrix",
    """WITH a AS (
      |  SELECT DISTINCT o_custkey AS u,
      |         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
      |  FROM orders),
      |c AS (SELECT u, min(m) AS cohort_m FROM a GROUP BY 1),
      |mat AS (
      |  SELECT c.cohort_m, a.m - c.cohort_m AS ofs,
      |         CAST(count(*) AS BIGINT) AS n_active
      |  FROM a JOIN c ON c.u = a.u GROUP BY 1, 2),
      |sz AS (SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_n
      |       FROM c GROUP BY 1)
      |SELECT mat.cohort_m, mat.ofs, mat.n_active, sz.cohort_n,
      |       CAST(mat.n_active * 1000000 // sz.cohort_n AS BIGINT) AS ret_ppm
      |FROM mat JOIN sz ON sz.cohort_m = mat.cohort_m
      |ORDER BY mat.cohort_m, mat.ofs""".stripMargin) { (s, dir) =>
    val a = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("u"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"))
      .distinct()
    val c = a.groupBy("u").agg(min("m").as("cohort_m"))
    val mat = a.join(c, "u")
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("ofs"))
      .agg(count(lit(1)).as("n_active"))
    val sz = c.groupBy("cohort_m").agg(count(lit(1)).as("cohort_n"))
    mat.join(broadcast(sz), "cohort_m")
      .select(col("cohort_m"), col("ofs"), col("n_active"), col("cohort_n"),
        expr("CAST((n_active * 1000000L) div cohort_n AS BIGINT)").as("ret_ppm"))
      .orderBy("cohort_m", "ofs")
  }

  val all: Seq[Q] = Seq(q205, q206)
}
