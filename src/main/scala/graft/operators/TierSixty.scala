package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 60 (round 11, ninth wave): relational DATA-QUALITY ops — the
  * dbt-tests-style constraint audit and its staged repair APPLY.
  *
  * The driver's TPC-H tables are constraint-CLEAN (FK orphans, PK dups,
  * null/range violations all zero — probed), so the audit INJECTS
  * deterministic violations in-query, declared identically in both
  * engines (the q84/q119 injection convention): `o_custkey → −1` on
  * `o_orderkey % 97 = 0` (FK orphans), a duplicated key echo on
  * `% 101 = 0` (PK dups), `l_shipdate → NULL` on `l_orderkey % 89 = 0`.
  * Clean checks stay live on the REAL data: `ship_before_order` fires
  * on the fixture's genuine impossible rows (29 157 at sf0.01 — the
  * q185 finding as a counted check), while `fk_lineitem_orders` and
  * `range_quantity` report honest zeros.
  *
  *  - q203: TABLE AUDIT — six (check, violations) rows: two injected FK/
  *    PK/null fires, two honest zeros, one genuine-data fire. Each check
  *    is one anti-join or one filtered count — partial+final, no check
  *    reads another's output.
  *  - q204: INTEGRITY REPAIR — the audit's ACTION (the q26→q53 pattern):
  *    the injected orders frame flows fk-screen (left-semi against
  *    customer) → PK dedup → kept, reporting per-stage row counts. The
  *    stages compose in the production order; counts are bounded driver
  *    reads of four aggregates.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star product ops.
  */
object TierSixty {

  private def injSql =
    """SELECT o_orderkey, CASE WHEN o_orderkey % 97 = 0 THEN -1
      |         ELSE o_custkey END AS ck FROM orders""".stripMargin

  val q203 = Q("q203_table_audit",
    s"""WITH inj AS ($injSql),
       |dup AS (
       |  SELECT o_orderkey FROM orders
       |  UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 101 = 0)
       |SELECT check_name, violations FROM (
       |  SELECT 'fk_lineitem_orders' AS check_name, CAST(count(*) AS BIGINT) AS violations
       |    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
       |    WHERE o.o_orderkey IS NULL
       |  UNION ALL SELECT 'fk_orders_customer_inj', CAST(count(*) AS BIGINT)
       |    FROM inj LEFT JOIN customer c ON c.c_custkey = inj.ck
       |    WHERE c.c_custkey IS NULL
       |  UNION ALL SELECT 'null_shipdate_inj', CAST(count(*) AS BIGINT)
       |    FROM (SELECT CASE WHEN l_orderkey % 89 = 0 THEN NULL
       |                 ELSE l_shipdate END AS sd FROM lineitem)
       |    WHERE sd IS NULL
       |  UNION ALL SELECT 'pk_duplicate_orders_inj', CAST(count(*) AS BIGINT)
       |    FROM (SELECT o_orderkey FROM dup GROUP BY 1 HAVING count(*) > 1)
       |  UNION ALL SELECT 'range_quantity', CAST(count(*) AS BIGINT)
       |    FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 1000
       |  UNION ALL SELECT 'ship_before_order', CAST(count(*) AS BIGINT)
       |    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
       |    WHERE l.l_shipdate < o.o_orderdate
       |) ORDER BY check_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    val lineitem = Tables.load(s, dir, "lineitem")
    val customer = Tables.load(s, dir, "customer")
    val inj = orders.select(col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, lit(-1L)).otherwise(col("o_custkey")).as("ck"))
    val dup = orders.select("o_orderkey")
      .union(orders.filter(col("o_orderkey") % 101 === 0).select("o_orderkey"))
    val checks = Seq(
      "fk_lineitem_orders" ->
        lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
          "left_anti").count(),
      "fk_orders_customer_inj" ->
        inj.join(customer, inj("ck") === customer("c_custkey"), "left_anti").count(),
      "null_shipdate_inj" ->
        lineitem.select(when(col("l_orderkey") % 89 === 0, lit(null))
            .otherwise(col("l_shipdate")).as("sd"))
          .filter(col("sd").isNull).count(),
      "pk_duplicate_orders_inj" ->
        dup.groupBy("o_orderkey").count().filter(col("count") > 1).count(),
      "range_quantity" ->
        lineitem.filter(col("l_quantity") <= 0 || col("l_quantity") > 1000).count(),
      "ship_before_order" ->
        lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
          .filter(col("l_shipdate") < col("o_orderdate")).count())
    checks.toDF("check_name", "violations").orderBy("check_name")
  }

  val q204 = Q("q204_integrity_repair",
    s"""WITH inj AS (
       |  $injSql
       |  UNION ALL
       |  SELECT o_orderkey, CASE WHEN o_orderkey % 97 = 0 THEN -1
       |         ELSE o_custkey END FROM orders WHERE o_orderkey % 101 = 0),
       |fk AS (SELECT inj.o_orderkey FROM inj JOIN customer c ON c.c_custkey = inj.ck),
       |dd AS (SELECT o_orderkey FROM fk GROUP BY 1),
       |c0 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM inj),
       |c1 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM fk),
       |c2 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM dd)
       |SELECT stage, n FROM (
       |  SELECT 'a_rows_in' AS stage, c0.v AS n FROM c0
       |  UNION ALL SELECT 'b_fk_dropped', c0.v - c1.v FROM c0, c1
       |  UNION ALL SELECT 'c_dup_dropped', c1.v - c2.v FROM c1, c2
       |  UNION ALL SELECT 'd_kept', c2.v FROM c2
       |) ORDER BY stage""".stripMargin) { (s, dir) =>
    import s.implicits._
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    val injOne = orders.select(col("o_orderkey"),
      when(col("o_orderkey") % 97 === 0, lit(-1L)).otherwise(col("o_custkey")).as("ck"))
    val inj = injOne.union(injOne.filter(col("o_orderkey") % 101 === 0))
    val fk = inj.join(customer, inj("ck") === customer("c_custkey"), "left_semi")
    val c0 = inj.count(); val c1 = fk.count()
    val c2 = fk.select("o_orderkey").distinct().count()
    Seq(("a_rows_in", c0), ("b_fk_dropped", c0 - c1),
      ("c_dup_dropped", c1 - c2), ("d_kept", c2))
      .toDF("stage", "n").orderBy("stage")
  }

  val all: Seq[Q] = Seq(q203, q204)
}
