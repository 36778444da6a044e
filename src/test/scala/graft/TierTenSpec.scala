package graft

import graft.operators.TierTen
import org.apache.spark.sql.functions._

/** Tier-10 corpus-lifecycle operators: properties the DuckDB oracle can't
  * express (cross-query arithmetic, brute-force differentials, plan gates).
  */
class TierTenSpec extends SparkSpec {

  test("q74 snapshot diff: classes partition both snapshots (membership arithmetic)") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val old = docs.filter(_ % 5 != 0).toSet
    val nw = docs.filter(_ % 7 != 0).toSet
    val expected = Map(
      "added" -> (nw -- old).size.toLong,
      "removed" -> (old -- nw).size.toLong,
      "modified" -> (old & nw).count(_ % 11 == 0).toLong,
      "unchanged" -> (old & nw).count(_ % 11 != 0).toLong)
    val got = TierTen.q74.run(spark, sf).collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(got == expected.filter(_._2 > 0))
  }

  test("q74 plan: full outer join on ids, document bodies never reach the shuffle") {
    val plan = TierTen.q74.run(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan.take(800))
    // both sides project (id, lang, sha2 digest) BEFORE exchanging — the raw
    // text column exists only below the scans, never as a join/exchange output
    val joinOn = plan.linesIterator.filter(l => l.contains("FullOuter")).mkString
    assert(!joinOn.contains("text"), joinOn)
  }

  test("q75 split partitions the corpus: disjoint by construction, exhaustive by count") {
    val rows = TierTen.q75.run(spark, sf).collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum == total, "every doc lands in exactly one split")
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit("train") > total * 9 / 10, s"train share off: $bySplit")
    // stability: re-running assigns identically (pure arithmetic, no randomness)
    assert(TierTen.q75.run(spark, sf).collect().toSeq == rows.toSeq)
  }

  test("q76 source stats: mean is integer div of the totals; dups bounded by docs") {
    TierTen.q76.run(spark, sf).collect().foreach { r =>
      val (n, total, mean, dups) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(mean == total / n)
      assert(dups >= 0 && dups < n)
    }
  }

  test("q77 boilerplate ≡ brute force (shingle sets computed in Scala)") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val shingles = docs.collect { case (id, toks) if toks.length >= 8 =>
      id -> toks.sliding(8).map(_.mkString(" ")).toSet
    }.toMap
    val dfCount = shingles.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = shingles.map { case (id, ss) =>
      val shared = ss.count(dfCount(_) >= 2).toLong
      (id, ss.size.toLong, shared * 1000000L / ss.size)
    }.toSet
    val got = TierTen.q77.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q78 decontamination ≡ brute force, and its train counts ≡ q75's train split") {
    val P = 2147483647L; val A0 = 2654435761L; val B0 = 40503L
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bkt(id: Long) = ((id % P) * A0 + B0) % P % 1000
    def tris(t: String) = t.split(" ").filter(_.nonEmpty).sliding(3)
      .filter(_.length == 3).map(_.mkString(" ")).toSet
    val evalTris = docs.filter(d => bkt(d._1) >= 980).flatMap(d => tris(d._3)).toSet
    val train = docs.filter(d => bkt(d._1) < 980)
    val expected = train.groupBy(_._2).view.mapValues { ds =>
      (ds.size.toLong, ds.count(d => tris(d._3).exists(evalTris)).toLong)
    }.toMap
    val got = TierTen.q78.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected && got.nonEmpty)
    val q75train = TierTen.q75.run(spark, sf).collect()
      .filter(_.getString(0) == "train").map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got.view.mapValues(_._1).toMap == q75train,
      "q78's train universe must be exactly q75's train split")
  }

  test("q81 funnel ≡ greedy brute force; stage counts monotone") {
    val events = Tables.load(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2)))
    val byUser = events.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Option[java.time.LocalDateTime]) =
      byUser(u).filter(e => e._2 == tpe && after.forall(a => e._3.isAfter(a)))
        .map(_._3).sortBy(_.toString).headOption
    var (nv, nc, np, cMs, pMs) = (0L, 0L, 0L, 0L, 0L)
    // floor each timestamp to ms BEFORE differencing — the engine's
    // unix_millis and the oracle's epoch_ms both truncate per timestamp,
    // which differs from flooring the difference when sub-ms parts cross
    def ms(a: java.time.LocalDateTime, b: java.time.LocalDateTime) =
      b.toInstant(java.time.ZoneOffset.UTC).toEpochMilli -
        a.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    byUser.keys.foreach { u =>
      firstAfter(u, "view", None).foreach { v =>
        nv += 1
        firstAfter(u, "click", Some(v)).foreach { c =>
          nc += 1; cMs += ms(v, c)
          firstAfter(u, "purchase", Some(c)).foreach { p => np += 1; pMs += ms(v, p) }
        }
      }
    }
    val got = TierTen.q81.run(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("1_view" -> ((nv, 0L)), "2_click" -> ((nc, cMs)),
      "3_purchase" -> ((np, pMs))))
    assert(nv >= nc && nc >= np && np > 0, s"funnel must narrow: $nv/$nc/$np")
  }

  test("tier-10 + screen plans: no CartesianProduct, no single-partition exchange") {
    Seq(TierTen.q74, TierTen.q75, TierTen.q76, TierTen.q77, TierTen.q78,
      graft.operators.TierNine.q73).foreach { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name}: ${plan.take(800)}")
      assert(!plan.contains("Exchange SinglePartition"), s"${q.name}: ${plan.take(800)}")
    }
    // q78's contamination probe is a SEMI join (no payload columns move)
    val p78 = TierTen.q78.run(spark, sf).queryExecution.executedPlan.toString
    assert(p78.contains("LeftSemi"), p78.take(800))
  }
}
