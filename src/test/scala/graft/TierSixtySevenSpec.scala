package graft

import graft.operators.TierSixtySeven
import org.apache.spark.sql.functions._

/** Tier-67 differentials: q217 against an in-memory per-column recount
  * with the null counter FIRED on a constructed frame (the driver
  * tables are constraint-clean, so fixture nulls are honest zeros);
  * q218 against an in-memory CUSUM-onset fold, plus the no-alarm
  * all-null branch on a constructed flat grid.
  */
class TierSixtySevenSpec extends SparkSpec {

  import spark.implicits._

  test("q217 ≡ in-memory per-column recount; honest zeros on the clean fixture") {
    val got = TierSixtySeven.q217.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val rows = Tables.load(spark, sf, "orders")
      .select(TierSixtySeven.ProfileCols.map(col): _*).collect()
    val want = TierSixtySeven.ProfileCols.zipWithIndex.map { case (c, i) =>
      val vs = rows.map(r => if (r.isNullAt(i)) null else r.get(i))
      (c, rows.length.toLong, vs.count(_ == null).toLong,
        vs.filter(_ != null).distinct.length.toLong)
    }.sortBy(_._1)
    assert(got == want, s"profile mismatch: $got vs $want")
    assert(got.forall(_._3 == 0L), "driver tables are constraint-clean: honest zeros")
    assert(got.map(_._4).distinct.size > 1, "distinct counts must vary by column")
  }

  test("q217 null counter fires on a constructed frame") {
    val df = Seq((Some(1L), "a"), (None, "b"), (None, "a"))
      .toDF("k", "v")
    val got = TierSixtySeven.profile(df, Seq("k", "v"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("k", 3L, 2L, 1L), ("v", 3L, 0L, 2L)),
      s"nulls and distincts must count exactly: $got")
  }

  test("q218 ≡ in-memory CUSUM onset fold; flat grid reports all nulls") {
    val got = TierSixtySeven.q218.run(spark, sf).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val grid = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = grid.groupBy(_._1).toSeq.map { case (t, rs) =>
      val days = rs.groupBy(_._2).toSeq.map { case (d, h) => (d, h.length.toLong) }
        .sortBy(_._1)
      val mu = days.map(_._2).sum / days.size
      val k = mu / 20; val h = mu / 3
      var sp = 0L; var sn = 0L
      val chart = days.map { case (d, c) =>
        sp = math.max(0L, sp + c - mu - k); sn = math.max(0L, sn + mu - k - c)
        (d, sp, sn, sp > h || sn > h)
      }
      chart.find(_._4) match {
        case None => (t, None, None, None)
        case Some((fad, fsp, fsn, _)) =>
          val side = if (fsp >= fsn) "up" else "down"
          val lz = chart.filter(r => r._1 < fad &&
            (if (side == "up") r._2 == 0L else r._3 == 0L))
            .map(_._1).maxOption
          (t, Some(fad), Some(side), lz)
      }
    }.sortBy(_._1)
    assert(got == want, s"onset mismatch: $got vs $want")
    assert(got.exists(_._2.nonEmpty), "an alarm must fire somewhere on the fixture")

    // constructed flat grid: one event per day per type → mu = 1, sums 0,
    // no alarm anywhere → the all-null row branch
    val flat = (0 until 30).flatMap { d =>
      Seq("a", "b").map(t =>
        (t, java.sql.Timestamp.valueOf(java.time.LocalDateTime
          .of(2024, 1, 1, 0, 0).plusDays(d))))
    }.toDF("event_type", "ts")
    val quiet = TierSixtySeven.onsetOf(flat).collect()
      .map(r => (r.getString(0), r.isNullAt(1), r.isNullAt(2), r.isNullAt(3)))
      .toSeq.sortBy(_._1)
    assert(quiet == Seq(("a", true, true, true), ("b", true, true, true)),
      s"a flat grid must report honest nulls: $quiet")
  }
}
