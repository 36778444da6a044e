package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tier 50 (round 10, twenty-second wave): split parity and the
  * fulfillment-latency closer.
  *
  *  - q184: SPLIT PARITY TABLE — q75's deterministic train/valid/test
  *    split crossed with the CORPUS-level token-length decile (exact
  *    `Cumulative.rowNumber` rank over ALL docs, so the decile
  *    definition is split-independent): the "did the split distort the
  *    length distribution?" audit a data card reports. Every doc lands
  *    in one (split, decile) cell; corpus-decile margins are exactly
  *    n/10 ± 1 by construction.
  *  - q185: SHIP-LATENCY PERCENTILES — whole-day order→ship latency per
  *    order priority: count + exact p50/p90 (the q140 percentile ≡
  *    quantile_cont convention, round(,6)): the fulfillment-SLA table,
  *    and the relational twin of q140's conversion latency.
  *
  * Reference mapping: none (SURVEY.md §2.1) — north-star audit/ops.
  */
object TierFifty {

  import TierFour.{A0, B0, P}

  val q184 = Q("q184_split_parity",
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |           AS n_tok,
       |         CASE WHEN ((doc_id % $P) * $A0 + $B0) % $P % 1000 < 980 THEN 'train'
       |              WHEN ((doc_id % $P) * $A0 + $B0) % $P % 1000 < 990 THEN 'valid'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
       |r AS (
       |  SELECT split,
       |         CAST(row_number() OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS lr
       |  FROM t)
       |SELECT r.split, ((r.lr - 1) * 10) // n.n AS len_decile,
       |       CAST(count(*) AS BIGINT) AS n_docs
       |FROM r, n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tok"),
        when(expr(s"((doc_id % $P) * $A0 + $B0) % $P % 1000") < 980, "train")
          .when(expr(s"((doc_id % $P) * $A0 + $B0) % $P % 1000") < 990, "valid")
          .otherwise("test").as("split"))
    val n = t.count() // documented 1-long driver read (the q180 pattern)
    Cumulative.rowNumber(s, t, Seq(col("n_tok"), col("doc_id")), "lr")
      .select(col("split"), expr(s"((lr - 1) * 10) div $n").as("len_decile"))
      .groupBy("split", "len_decile")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "len_decile")
  }

  val q185 = Q("q185_ship_latency",
    """WITH d AS (
      |  SELECT o.o_orderpriority AS priority,
      |         date_diff('microsecond', o.o_orderdate, l.l_shipdate)
      |           // 86400000000 AS lat_d
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
      |SELECT priority,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       round(quantile_cont(CAST(lat_d AS DOUBLE), 0.5), 6) AS p50_d,
      |       round(quantile_cont(CAST(lat_d AS DOUBLE), 0.9), 6) AS p90_d
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr("(unix_micros(CAST(l_shipdate AS TIMESTAMP))"
          + " - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000")
          .as("lat_d"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_lines"),
        round(expr("percentile(CAST(lat_d AS DOUBLE), 0.5)"), 6).as("p50_d"),
        round(expr("percentile(CAST(lat_d AS DOUBLE), 0.9)"), 6).as("p90_d"))
      .orderBy("priority")
  }

  val all: Seq[Q] = Seq(q184, q185)
}
