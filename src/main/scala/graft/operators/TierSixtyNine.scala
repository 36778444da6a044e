package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 69 (round 11, eighteenth wave): two window/grouping surfaces
  * the relational inventory still lacked — the time-RANGE frame and
  * the full CUBE lattice.
  *
  *  - q221: TRAILING-24H RANGE FRAME — per event, the same-user count
  *    and cents spent in the PRECEDING 24 hours including the event:
  *    a RANGE frame over event-time seconds (`rangeBetween(-86399,
  *    0)`), the mechanism ROWS frames (q37's moving average) cannot
  *    express — the frame width follows the DATA's timestamps, not a
  *    row count, so bursts widen membership and quiet days shrink it.
  *    The "how active was this user lately" feature join every
  *    fraud/engagement model starts from. Per-user partitions keep the
  *    window state bounded per key (never a global sort).
  *  - q222: CUBE LATTICE — q16's rollup completes to the full
  *    2-dimension CUBE over (o_orderstatus, o_orderpriority) with the
  *    GROUPING_ID distinguishing genuine NULL group values from
  *    subtotal markers (the reason COALESCE alone is not a correct
  *    subtotal decoder — grouping_id is the principled one). One
  *    Expand ×4 pass, partial+final; the (status)-only and
  *    (priority)-only subtotal planes are what ROLLUP's strict
  *    hierarchy omits.
  *
  * Scale: q221 is one user-keyed shuffle; within a partition Spark
  * evaluates the range frame by a sliding two-pointer over the sorted
  * run — O(run) not O(run²). q222's Expand multiplies rows ×4 into a
  * partial agg that collapses immediately (the grouping-sets execution
  * model; acceptable because the lattice is declared, never
  * discovered).
  *
  * Reference mapping: none (SURVEY.md §2.1) — relational breadth.
  */
object TierSixtyNine {

  val q221 = Q("q221_range_frame",
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
      |         CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT user_id, event_id,
      |       CAST(count(*) OVER w AS BIGINT) AS n_24h,
      |       CAST(sum(cents) OVER w AS BIGINT) AS cents_24h
      |FROM ev
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("sec"),
        floor(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-86399L, 0L)
    ev.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum("cents").over(w).as("cents_24h"))
      .orderBy("user_id", "event_id")
  }

  val q222 = Q("q222_cube_lattice",
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |       COALESCE(o_orderpriority, '(all)') AS priority,
      |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
      |            AS BIGINT) AS gid,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("gid"), col("cnt"))
      .orderBy("gid", "status", "priority")
  }

  val all: Seq[Q] = Seq(q221, q222)
}
