package graft

import graft.operators.TierFiftySix
import org.apache.spark.sql.functions._

/** Tier-56 differentials: q196 against an independent in-memory BRR
  * computation plus the exact-shift and separated-arms laws; q197
  * against an in-memory sequential EWMA fold plus the constant-series
  * and step-change control-chart laws.
  */
class TierFiftySixSpec extends SparkSpec {

  import spark.implicits._

  // --- q196 -----------------------------------------------------------

  /** Independent in-memory BRR over (user, arm, cents) rows: replicate
    * membership recomputed from first principles with BigInt affine
    * arithmetic, means floored the documented way. */
  private def directBrr(rows: Seq[(Long, Long, Long)]): (Long, Long, Long, Long, Long) = {
    val P = BigInt(2147483647L); val A0 = BigInt(2654435761L)
    val B0 = BigInt(40503L); val C = BigInt(1299709L)
    def mean(xs: Seq[Long]): BigInt =
      xs.map(BigInt(_)).sum * 100 / xs.size
    def theta(xs: Seq[(Long, Long, Long)]): BigInt =
      mean(xs.filter(_._2 == 1).map(_._3)) - mean(xs.filter(_._2 == 0).map(_._3))
    def inRep(u: Long, r: Int): Boolean =
      (((BigInt(u) % P * A0 + B0) % P + C * r) % P * A0 + B0) % P % 2 == 1
    val t0 = theta(rows)
    val varC2 = (0 until TierFiftySix.Reps).map { r =>
      val d = theta(rows.filter(x => inRep(x._1, r))) - t0
      d * d
    }.sum / TierFiftySix.Reps
    val sig = if (BigInt(10000) * t0 * t0 > BigInt(38415) * varC2) 1L else 0L
    (rows.count(_._2 == 0), rows.count(_._2 == 1), t0.toLong, varC2.toLong, sig)
  }

  test("q196 ≡ independent in-memory BRR on the fixture; honest A/A not significant") {
    val got = TierFiftySix.q196.run(spark, sf).collect().head
    val ev = Tables.load(spark, sf, "events")
    val users = ev.select("user_id").distinct()
      .withColumn("arm", expr("((user_id % 2147483647) * 2654435761 + 40503) % 2147483647 % 2"))
    val rev = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(floor(col("value") * 100)).as("cents"))
    val rows = users.join(rev, Seq("user_id"), "left")
      .select(col("user_id"), col("arm"), coalesce(col("cents"), lit(0L)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (na, nb, th, v, sig) = directBrr(rows)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) === ((na, nb, th, v, sig)))
    assert(v > 0, "replicate spread must be non-degenerate")
    assert(sig == 0L, "the A/A fixture must not flag significant")
    // decorrelation: every (replicate, arm) cell is inhabited — the naive
    // h(u)+r·C parity selector collapses cells to ~0/1 users
    val occupied = (0 until TierFiftySix.Reps).forall { r =>
      rows.exists(x => x._2 == 0 &&
        directBrrCell(x._1, r)) && rows.exists(x => x._2 == 1 && directBrrCell(x._1, r))
    }
    assert(occupied, "every replicate must hit both arms")
  }

  private def directBrrCell(u: Long, r: Int): Boolean = {
    val P = BigInt(2147483647L); val A0 = BigInt(2654435761L)
    val B0 = BigInt(40503L); val C = BigInt(1299709L)
    (((BigInt(u) % P * A0 + B0) % P + C * r) % P * A0 + B0) % P % 2 == 1
  }

  test("q196 laws: exact mean-shift moves θ by 100·Δ with Var invariant; separated arms flag") {
    // constructed cohort: 40 users, deterministic cents
    val base = (1L to 40L).map(u => (u, armOf(u), 1000L + (u * 37L) % 500L))
    val (_, _, th0, v0, _) = directBrr(base)
    // add exactly Δ=200 cents to every arm-1 user: each arm-1 mean —
    // full AND every replicate — shifts by exactly 100·200 (n divides nΔ)
    val shifted = base.map { case (u, a, c) => (u, a, if (a == 1) c + 200 else c) }
    val (_, _, th1, v1, _) = directBrr(shifted)
    assert(th1 - th0 === 100L * 200L, "θ must shift exactly 100·Δ")
    assert(v1 === v0, "uniform shift must leave the replicate variance unchanged")
    // separate the arms far beyond the replicate noise → significant
    val separated = base.map { case (u, a, c) => (u, a, if (a == 1) c + 100000L else c) }
    val (_, _, thS, vS, sigS) = directBrr(separated)
    assert(sigS === 1L, s"separated arms must flag (θ=$thS var=$vS)")
    // and the Spark closure agrees with the in-memory one on this input
    val hs = for {
      r <- 0 until TierFiftySix.Reps; a <- Seq(0L, 1L)
      cell = separated.filter(x => x._2 == a && directBrrCell(x._1, r))
    } yield (r.toLong, a, cell.size.toLong, cell.map(_._3).sum)
    val fl = Seq(0L, 1L).map { a =>
      val c = separated.filter(_._2 == a); (a, c.size.toLong, c.map(_._3).sum)
    }
    val (_, _, thC, vC, sigC) = TierFiftySix.brrReport(fl, hs)
    assert((thC, vC, sigC) === ((thS, vS, sigS)))
  }

  private def armOf(u: Long): Long =
    ((BigInt(u) % 2147483647L * BigInt(2654435761L) + 40503L) % 2147483647L % 2).toLong

  // --- q197 -----------------------------------------------------------

  /** In-memory sequential EWMA fold — the reference the distributed
    * per-type mapPartitions must reproduce exactly. */
  private def directEwma(grid: Seq[(String, Long, Long)]): Seq[(String, Long, Long, Long, Long)] =
    grid.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      var prev = -1L
      sorted.map { case (_, d, c) =>
        val first = prev < 0
        val e = if (first) c else (7 * prev + c) / 8
        val flag = if (!first && 100L * math.abs(c - prev) > TierFiftySix.EwmaK * prev) 1L else 0L
        prev = e
        (t, d, c, e, flag)
      }
    }.sortBy(x => (x._1, x._2))

  test("q197 ≡ in-memory sequential fold on the fixture; first day never flags") {
    val got = TierFiftySix.q197.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val grid = operators.TierThirtyTwo.dailyCounts(Tables.load(spark, sf, "events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.toSeq === directEwma(grid))
    val firstDay = grid.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).min }
    assert(got.filter(x => firstDay(x._1) == x._2).forall(_._5 == 0L),
      "day one carries no flag")
    assert(got.exists(_._5 == 1L), "the fixture must exercise the flagged state")
    assert(got.exists(_._5 == 0L), "the fixture must exercise the quiet state")
  }

  test("q197 laws: constant series is a fixed point; a step change flags then converges") {
    // constant: ewma pinned at the level, zero flags
    val flat = (0L until 20L).map(d => ("t", d, 64L))
    val gotFlat = TierFiftySix.ewmaChart(flat.toDF("event_type", "day_idx", "cnt"))
      .orderBy("day_idx").collect()
    assert(gotFlat.forall(r => r.getLong(3) == 64L && r.getLong(4) == 0L))
    // step: 64 → 128 at day 10 on an unsorted, oddly-partitioned input
    val step = (0L until 20L).map(d => ("t", d, if (d < 10) 64L else 128L))
    val shuffled = new scala.util.Random(42).shuffle(step)
      .toDF("event_type", "day_idx", "cnt").repartition(7)
    val got = TierFiftySix.ewmaChart(shuffled).orderBy("day_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === directEwma(step).map(x => (x._2, x._3, x._4, x._5)))
    assert(got(10)._4 == 1L, "the jump day must flag (|128-64| = 100% > 20%)")
    // ewma climbs monotonically toward the new level and stays below it
    val tail = got.drop(10).map(_._3)
    assert(tail.zip(tail.tail).forall { case (a, b) => a <= b } && tail.forall(_ <= 128L))
    // once adapted (relative gap under 20%), the chart goes quiet again
    assert(got.last._4 == 0L, "the adapted chart must not keep flagging")
  }
}
