package graft.tools

import graft.{Engine, SparkEntry, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop stage profiler: `runMain graft.tools.Profile <sfDir> <query>`
  * prints row counts and per-stage times for the heavy similarity queries.
  * Not part of the driver contract — a diagnosis tool.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val q = if (args.length > 1) args(1) else "q26_minhash_lsh"
    val spark = Engine.localSession("graft-profile")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (q == "q26stages") {
      val P = 2147483647L
      val A0 = 2654435761L
      val B0 = 40503L
      // replicate q26's CURRENT stages (single-groupBy signature, masks
      // riding the postings) to time each
      for (pass <- Seq("warm", "timed")) {
        spark.catalog.clearCache()
        println(s"[profile] ---- $pass ----")
        val t = time("tok") {
          val d = TextOps.tok(spark, sfDir); noop(d); d
        }
        val v = time("vocab") { val d = TextOps.vocab(t); noop(d); d }
        val tokid = time("tokid+persist") {
          val d = TextOps.tokid(t, v).persist(); d.count(); d
        }
        val mhCols = (0 until 32).map { i =>
          val a = (A0 * (i + 1)) % P
          val b = (B0 * (i + 1)) % P
          min((lit(a) * col("tid") + lit(b)) % P).as(s"mh$i")
        }
        val sig = time("sig (32 min-agg cols)") {
          val d = tokid.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
          noop(d); d
        }
        val w = Seq(2248091L, 17161L, 131L, 1L)
        val bandCols = (0 until 8).map { bnd =>
          ((0 until 4).map(p => col(s"mh${bnd * 4 + p}") * w(p)).reduce(_ + _) % P)
            .as(s"bk$bnd")
        }
        val bkeys = sig.select(col("doc_id") +: bandCols: _*)
          .select(col("doc_id"),
            array((0 until 8).map(b => col(s"bk$b")): _*).as("ks"))
        val postings = time("postings (masks attached)+persist") {
          val d = bkeys.join(TextOps.tokenMasks(tokid), "doc_id")
            .select(col("doc_id"), col("ks"), col("mask"), col("n"),
              posexplode(col("ks")).as(Seq("band", "bkey")))
            .persist()
          d.count(); d
        }
        val x = postings.select(col("doc_id").as("doc_a"), col("ks").as("ka"),
          col("band"), col("bkey"), col("mask").as("ma"), col("n").as("na"))
        val y = postings.select(col("doc_id").as("doc_b"), col("ks").as("kb"),
          col("band").as("band_b"), col("bkey").as("bkey_b"),
          col("mask").as("mb"), col("n").as("nb"))
        val earlierBandMatched = (0 until 7)
          .map(b => col("band") > b &&
            element_at(col("ka"), b + 1) === element_at(col("kb"), b + 1))
          .reduce(_ || _)
        val pairs = x.join(y,
          col("band") === col("band_b") && col("bkey") === col("bkey_b") &&
            col("doc_a") < col("doc_b") && !earlierBandMatched)
        val nc = time("cand (count)") { pairs.count() }
        println(s"[profile] candidates = $nc")
        val verified = pairs
          .withColumn("i", expr("cast(bit_count(ma & mb) as bigint)"))
          .withColumn("j", col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .filter(col("j") >= 0.6)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
        time("verify (no sort, noop)") { noop(verified) }
        time("verify + orderBy (noop)") { noop(verified.orderBy("doc_a", "doc_b")) }
      }
    } else {
      // warm (construction + execution, untimed)
      noop(SparkEntry.queries(q)(spark, sfDir))
      // timed, cold-cache — split plan construction (driver actions like the
      // adaptive v.count() and Cumulative's offset collect) from execution
      spark.catalog.clearCache()
      val df = time(s"$q construct") { SparkEntry.queries(q)(spark, sfDir) }
      time(s"$q execute (noop)") { noop(df) }
      spark.catalog.clearCache()
      val df2 = time(s"$q construct (2nd)") { SparkEntry.queries(q)(spark, sfDir) }
      println(s"[profile] rows = ${time(s"$q count") { df2.count() }}")
    }
    spark.stop()
  }
}
