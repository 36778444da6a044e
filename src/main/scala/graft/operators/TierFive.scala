package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier 5 — remaining breadth: embedding-space dedup, session windows,
  * interval (range) joins, and the typed-UDAF capability proof
  * (SURVEY.md §2.2/§4.3).
  */
object TierFive {

  /** Embedding-cosine near-duplicate pairs (the vector-space dedup modality;
    * text-space variants are q23/q26/q28): all pairs with cosine ≥ 0.45,
    * exact double math identical to q24's. This is the exact anchor —
    * O(n²) pairs with a fused codegen'd dot product per pair (BNLJ over a
    * broadcast side, no shuffle); the 100 TB path is bucketed LSH exactly as
    * [[TierFour.q29]] (bucket id as join/cluster key), validated against
    * this output.
    */
  val q35 = Q("q35_embedding_near_dup",
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
      |SELECT vec_id_a, vec_id_b, round(c, 6) AS cos FROM (
      |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
      |         list_dot_product(a.e, b.e) /
      |         (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
      |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
      |WHERE c >= 0.45 ORDER BY vec_id_a, vec_id_b""".stripMargin) { (s, dir) =>
    embeddingPairs(s, dir)
      .select(col("vec_id_a"), col("vec_id_b"), round(col("c"), 6).as("cos"))
      .orderBy("vec_id_a", "vec_id_b")
  }

  /** q35's pair generator, unrounded/unordered — shared with the
    * vector-space cluster dedup ([[TierNine.q69]]). */
  private[operators] def embeddingPairs(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      call_function("graft_dot", x, y)
    // norms once per vector (O(n)), one codegen'd dot per pair (O(n²))
    val v = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val a = v.select(col("vec_id").as("vec_id_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_id_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .withColumn("c", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("c") >= 0.45)
  }

  /** Session windows (absent from the reference, whose windows are all
    * fixed-size — SURVEY.md §2.2): per-user sessions with a 6-hour
    * inactivity gap via Spark's native `session_window`, which merges an
    * event into the current session while it arrives strictly within gap of
    * the last one. The oracle reproduces that with the gaps-and-islands
    * idiom (lag → break flag → running sum). Session state partitions by
    * user — shuffle on the key, no global ordering anywhere.
    */
  val q36 = Q("q36_session_window",
    """WITH o AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
      |  FROM o)
      |SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** Interval (range) join: for every error event, how many events did the
    * same user produce in the preceding 24 hours. Equi-join on user_id
    * carries the shuffle; the range predicate filters inside the joined
    * stream — the standard scalable shape (at extreme per-key volumes the
    * refinement is bucketing ts into day-grain join keys so the range probe
    * touches only adjacent buckets). The reference has no joins at all.
    */
  val q37 = Q("q37_interval_join",
    """SELECT e.event_id, CAST(count(p.event_id) AS BIGINT) AS prior_events
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      |LEFT JOIN events p
      |  ON p.user_id = e.user_id
      | AND p.ts >= e.ts - INTERVAL 24 HOUR AND p.ts < e.ts
      |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
    val events = Tables.load(s, dir, "events")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("t0"))
    val prior = events.select(col("event_id").as("pid"), col("user_id"), col("ts"))
    errors.join(prior,
        col("user_id") === col("u")
          && col("ts") >= col("t0") - expr("INTERVAL 24 HOURS")
          && col("ts") < col("t0"),
        "left")
      .groupBy("event_id")
      .agg(count(col("pid")).as("prior_events"))
      .orderBy("event_id")
  }

  /** Typed-UDAF capability proof (SURVEY.md §4.3 item 2): the reference's
    * `CustomSumAggregator` (Main.java:358-383) as a Scala
    * `Aggregator[Long,Long,Long]` ([[graft.functions.TypedSum]]) registered
    * through `udaf()`, summing exact integer cents per event_type. The plan
    * is the same partial+final HashAggregate the built-in `sum` gets —
    * `merge` runs post-shuffle exactly like Flink's accumulator merge.
    */
  val q38 = Q("q38_typed_agg",
    """SELECT event_type,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val typedSum = udaf(graft.functions.TypedSum)
    Tables.load(s, dir, "events")
      .withColumn("cents_in", round(col("value") * 100).cast("long"))
      .groupBy("event_type")
      .agg(typedSum(col("cents_in")).as("cents"))
      .orderBy("event_type")
  }

  /** Pivot (cross-tab): hour-of-day × event_type counts. The pivot VALUES
    * are pinned explicitly — `pivot(col)` without values runs a distinct
    * discovery job over the data first, which at 100 TB is a full scan
    * before planning even starts; a declared domain keeps it one pass.
    * Oracle: FILTERed aggregates producing identical column names.
    */
  val q39 = Q("q39_pivot",
    """SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
      |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
      |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
      |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.load(s, dir, "events")
      .groupBy(hour(col("ts")).cast("long").as("hour"))
      .pivot("event_type", types)
      .agg(coalesce(count(lit(1)), lit(0L)))
      .na.fill(0L, types)
      .orderBy("hour")
  }

  /** Exact percentiles per group: median and p90 of `value`. Spark's
    * `percentile` and DuckDB's `quantile_cont` both do linear interpolation
    * over the sorted values — identical doubles, rounded at the boundary.
    * (The sketch counterpart for 100 TB is approxQuantile —
    * [[graft.functions.Sketches]].)
    */
  val q40 = Q("q40_percentile",
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
      .orderBy("event_type")
  }

  /** Moving aggregate over a row frame: per-user 3-event trailing average.
    * The frame order is total ((ts, event_id)), so the ≤3-element float sum
    * happens in the same sequence on both engines. Shuffles once on
    * user_id; sort is within partitions only.
    */
  val q41 = Q("q41_moving_avg",
    """SELECT event_id, user_id, round(avg(value) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(avg(col("value")).over(w), 6).as("mavg"))
      .orderBy("event_id")
  }

  /** As-of join — an operator Spark lacks natively, composed from built-ins
    * per the preference order (SURVEY.md engine rules: compose > custom
    * plan): for each error event, the most recent SAME-USER purchase
    * strictly before it in the total order (ts, event_id). One union + one
    * windowed `last(… IGNORE NULLS)` over a preceding-rows frame — a single
    * shuffle on user_id, no per-row subquery, no range join blow-up. DuckDB
    * mirrors the identical window formulation (its native ASOF JOIN has
    * subtly different tie semantics, so both sides pin this one).
    */
  val q42 = Q("q42_asof_join",
    """WITH u AS (
      |  SELECT event_id, user_id, ts, event_type,
      |         CASE WHEN event_type = 'purchase' THEN event_id END AS pid
      |  FROM events),
      |m AS (
      |  SELECT event_id, user_id, event_type,
      |         last_value(pid IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_id
      |  FROM u)
      |SELECT event_id, last_purchase_id FROM m WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, dir, "events")
      .withColumn("pid", when(col("event_type") === "purchase", col("event_id")))
      .withColumn("last_purchase_id", last(col("pid"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select("event_id", "last_purchase_id")
      .orderBy("event_id")
  }

  /** IVF-style ANN — the coarse-quantization scale path for q24 (the other
    * being q29's hyperplane LSH): vectors are partitioned into cells (here
    * the corpus' `label` plays the inverted-file cell id — a k-means
    * assignment in a production build), each cell gets a centroid, and a
    * query probes ONLY the nearest centroid's cell — at 10 cells a probe
    * scans ~10% of the table, and the cell id doubles as the partition key
    * at 100 TB. Centroids are per-dimension means ROUNDED to 6 dp (rounding
    * absorbs cross-engine partial-sum ordering in the mean; magnitudes ≲1,
    * error ~1e-15 against a 5e-7 boundary).
    */
  val q43 = Q("q43_ann_ivf",
    """WITH pos AS (SELECT unnest(range(1, 65)) AS j),
      |vals AS (
      |  SELECT label, j, embedding[j]::DOUBLE AS v FROM embeddings CROSS JOIN pos),
      |cent AS (
      |  SELECT label, list(round(av, 6) ORDER BY j) AS c FROM (
      |    SELECT label, j, avg(v) AS av FROM vals GROUP BY 1, 2) GROUP BY label),
      |q0 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      |best AS (
      |  SELECT label FROM cent CROSS JOIN q0
      |  ORDER BY list_dot_product(c, qv) /
      |    (sqrt(list_dot_product(c, c)) * sqrt(list_dot_product(qv, qv))) DESC, label ASC
      |  LIMIT 1)
      |SELECT e.vec_id, round(list_dot_product(e.embedding::DOUBLE[], qv) /
      |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
      |     sqrt(list_dot_product(qv, qv))), 6) AS cos
      |FROM embeddings e JOIN best ON e.label = best.label CROSS JOIN q0
      |WHERE e.vec_id <> 0
      |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
    Ann.ivfTopK(s, dir, nprobe = 1)
  }

  /** Edit-distance scalar (text-similarity breadth): Levenshtein over the
    * event-type vocabulary pairs — both engines ship the identical DP
    * algorithm as a codegen'd scalar.
    */
  val q44 = Q("q44_edit_distance",
    """WITH t AS (SELECT DISTINCT event_type FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       CAST(levenshtein(a.event_type, b.event_type) AS BIGINT) AS dist
      |FROM t a JOIN t b ON a.event_type < b.event_type
      |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir, "events").select("event_type").distinct()
    val a = t.select(col("event_type").as("type_a"))
    val b = t.select(col("event_type").as("type_b"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        levenshtein(col("type_a"), col("type_b")).cast("long").as("dist"))
      .orderBy("type_a", "type_b")
  }

  val all: Seq[Q] = Seq(q35, q36, q37, q38, q39, q40, q41, q42, q43, q44)
}
