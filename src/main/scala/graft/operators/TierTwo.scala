package graft.operators

import graft.{Q, Tables}
import graft.Determinism._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 2 — relational breadth (SURVEY.md §2.3 q12-q21). The reference has no
  * joins, sorts, set ops, or analytic windows (SURVEY.md §2.2); these queries
  * provide the relational surface a user of the engine needs, all as pure
  * Catalyst built-ins.
  *
  * Scale posture: every aggregation is partial+final (map-side combine before
  * the shuffle); joins either broadcast the dimension side (region/nation —
  * explicitly hinted) or shuffle-hash/SMJ on the key with AQE free to pick
  * (orders⋈customer — both sides scale with the data, so no hint: at 100 TB a
  * forced broadcast would be wrong, and AQE will still broadcast when the
  * built side is small at runtime). Top-k is TakeOrderedAndProject
  * (per-partition heap, single k-row merge — no global sort at any scale).
  */
object TierTwo {

  /** TPC-H Q1-shaped pricing summary. Mirrors the A-family aggregates
    * generalized (reference sums: Main.java:358-383). All money math in
    * exact DECIMAL (order-independent across partial/final plans and across
    * engines), cast to double + round(,6) only at the output boundary —
    * see [[graft.Determinism]].
    */
  val q12 = Q("q12_agg_suite",
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        f6(sum(dec2(col("l_quantity")))).as("sum_qty"),
        f6(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        f6(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))).as("sum_disc_price"),
        avg6(sum(dec2(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avg6(sum(dec2(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Inner join orders⋈customer on custkey, revenue per market segment.
    * No broadcast hint: both sides scale with the data — the shuffle join on
    * o_custkey/c_custkey is the 100 TB-correct plan, and AQE converts it to
    * broadcast at runtime when customer happens to be small.
    */
  val q13 = Q("q13_join_inner",
    """SELECT c_mktsegment,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        f6(sum(dec2(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** Left-semi and left-anti joins (reference has no joins at all —
    * SURVEY.md §2.2): customers with ≥1 order vs with none, as tagged
    * counts. Semi/anti never materialize the probe payload, so shuffle
    * volume is keys-only at scale.
    */
  val q14 = Q("q14_join_semi_anti",
    """SELECT kind, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'with_orders' AS kind, count(*) AS n FROM customer
      |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |  UNION ALL
      |  SELECT 'without_orders' AS kind, count(*) AS n FROM customer
      |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |) ORDER BY kind""".stripMargin) { (s, dir) =>
    val customer = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val semi = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val anti = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    semi.unionAll(anti).orderBy("kind")
  }

  /** Small-dimension chain nation⋈region with an explicit broadcast hint:
    * region/nation are bounded catalogs (≤25/5 rows at every sf), so the
    * join is a map-side hash probe with zero shuffle at any scale.
    */
  val q15 = Q("q15_join_broadcast_chain",
    """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
    val nation = Tables.load(s, dir, "nation")
    val region = Tables.load(s, dir, "region")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  /** ROLLUP(status, priority) counts. Rollup null-markers are coalesced to
    * '(all)' on BOTH sides — pins the marker representation and sidesteps
    * the engines' opposite NULL sort defaults (Spark nulls-first vs DuckDB
    * nulls-last). Data columns are never null in the corpus, so the marker
    * is unambiguous.
    */
  val q16 = Q("q16_grouping_sets",
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
      |       COALESCE(o_orderpriority, '(all)') AS priority,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("cnt"))
      .orderBy("status", "priority")
  }

  /** Exact count(DISTINCT user_id) per event_type. Catalyst plans this as
    * expand + two-level aggregate (dedup on (type, user) first, then count)
    * — the same shape that scales; `approx_count_distinct` (HLL) is the
    * sketch variant, exposed in [[graft.functions.Sketches]] and tested by
    * tolerance in ScalaTest (nondeterministic vs DuckDB, so not
    * oracle-declared — SURVEY.md §2.3).
    */
  val q17 = Q("q17_distinct",
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("event_type")
  }

  /** Top-3 orders per customer by totalprice — analytic row_number with the
    * tie-break pinned to orderkey ASC (SURVEY.md determinism rules). The
    * partitioned window shuffles once on custkey and sorts within
    * partitions only — no global sort.
    */
  val q18 = Q("q18_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Top-10 lineitems by extendedprice (ties: orderkey, linenumber).
    * orderBy+limit plans as TakeOrderedAndProject — per-partition top-10
    * heaps merged once on the driver, O(k) not O(n) memory, no global
    * sort: the plan that still works when lineitem is 100 TB.
    */
  val q19 = Q("q19_topk",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
  }

  /** Set operations (absent in the reference): custkeys with-orders vs
    * positive-balance as INTERSECT / EXCEPT / UNION, tagged and sorted.
    * Catalyst plans set ops as aggregates/joins on the key — fully
    * shuffle-parallel.
    */
  val q20 = Q("q20_setops",
    """WITH w AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |     p AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)
      |SELECT op, k FROM (
      |  SELECT 'intersect' AS op, k FROM (SELECT k FROM w INTERSECT SELECT k FROM p)
      |  UNION ALL
      |  SELECT 'except' AS op, k FROM (SELECT k FROM w EXCEPT SELECT k FROM p)
      |  UNION ALL
      |  SELECT 'union' AS op, k FROM (SELECT k FROM w UNION SELECT k FROM p)
      |) ORDER BY op, k""".stripMargin) { (s, dir) =>
    val w = Tables.load(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val p = Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
    val i = w.intersect(p).select(lit("intersect").as("op"), col("k"))
    val e = w.except(p).select(lit("except").as("op"), col("k"))
    val u = w.union(p).distinct().select(lit("union").as("op"), col("k"))
    i.unionAll(e).unionAll(u).orderBy("op", "k")
  }

  /** Scalar-function sampler over orders (SURVEY.md §2.2 scalar funcs):
    * upper/substring/length/date_trunc/extract/round — all codegen'd
    * built-ins, no UDFs. Integer-typed scalars cast to BIGINT on both
    * sides (Spark length/year return INT, DuckDB returns BIGINT — the
    * driver's schema compare sees identical int64 after the cast).
    * round() on positive doubles: Spark HALF_UP == DuckDB half-away-
    * from-zero, divergence only possible at exactly-.5 doubles which the
    * /7.0 quotient cannot produce.
    */
  val q21 = Q("q21_scalar_suite",
    """SELECT o_orderkey,
      |  upper(o_orderpriority) AS pri_upper,
      |  substr(o_orderpriority, 1, 3) AS pri_pfx,
      |  CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
      |  date_trunc('month', o_orderdate) AS order_month,
      |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
      |  round(o_totalprice / 7.0, 2) AS price_div
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 3).as("pri_pfx"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        round(col("o_totalprice") / 7.0, 2).as("price_div"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(q12, q13, q14, q15, q16, q17, q18, q19, q20, q21)
}
