package graft.tools

import graft.{Engine, Tables}
import graft.operators.Cumulative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway dev-loop stage profiler for the round-15 optimization pass —
  * times sub-plans of the queries under investigation on a WARM JVM (each
  * stage runs twice, second timing reported). Not part of the driver
  * contract; kept out of SparkEntry.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.localSession("graft-devprobe")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[devprobe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // ---- q281 decomposition ----
    val base = Tables.load(spark, sfDir, "customer")
      .select(col("c_name").as("s")).distinct().persist()
    noop(base)
    val keyed = base.withColumn("k", substring(col("s"), 1, 16))
    val prefixPairs = keyed.select(col("k"), col("s").as("sa"))
      .join(keyed.select(col("k"), col("s").as("sb")), Seq("k"))
      .filter(col("sa") < col("sb"))
      .select("sa", "sb")
    time("q281 prefixPairs")(noop(prefixPairs))
    println("[devprobe] prefixPairs rows = " + prefixPairs.count())
    val ranked = Cumulative.rowNumber(spark,
      base.withColumn("rev", reverse(col("s"))),
      Seq(col("rev"), col("s")), "rk").persist()
    noop(ranked)
    val left = ranked.select(col("s").as("s_a"),
        explode(sequence(lit(1L), lit(5L))).as("off"), col("rk"))
      .withColumn("rk_b", col("rk") + col("off"))
    val right = ranked.select(col("s").as("s_b"), col("rk").as("rk_b"))
    val snPairs = left.join(right, "rk_b")
      .select(least(col("s_a"), col("s_b")).as("sa"),
        greatest(col("s_a"), col("s_b")).as("sb"))
    time("q281 snPairs")(noop(snPairs))
    val uni = prefixPairs.unionByName(snPairs).distinct().persist()
    time("q281 union+distinct")(noop(uni))
    println("[devprobe] union rows = " + uni.count())
    time("q281 levenshtein+agg")(noop(
      uni.select(levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
        .filter(col("dist") <= 2 && col("dist") >= 1)
        .groupBy("dist").agg(count(lit(1)).as("n_pairs"))))
    time("q281 lev3+agg (threshold form)")(noop(
      uni.select(levenshtein(col("sa"), col("sb"), 2).cast("long").as("dist"))
        .filter(col("dist") <= 2 && col("dist") >= 1)
        .groupBy("dist").agg(count(lit(1)).as("n_pairs"))))

    // ---- a01-at-scale bisect: pairs materialization vs CC pre/post contraction ----
    if (args.length > 1 && args(1) == "cc") {
      import graft.operators.{Components, Pins, TextOps, TierFour}
      val docs = Tables.load(spark, sfDir, "documents")
      val pins = new Pins
      val t = pins(TextOps.tokOf(docs.select("doc_id", "text")))
      val v = TextOps.vocab(t, Some(pins))
      val pairs = pins(TierFour.minhashPairs(t, pins))
      val t0 = System.nanoTime()
      noop(pairs)
      println(f"[devprobe] a01 pairs noop (cold)               ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      println("[devprobe] pairs rows = " + pairs.count())
      val ids = docs.select(col("doc_id").as("id"))
      val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      for (pre <- Seq(true, false)) {
        val t1 = System.nanoTime()
        val res = Components.connectedWithStats(ids, e, preContract = pre)
        noop(res.labels)
        println(f"[devprobe] CC preContract=$pre%-5s               ${(System.nanoTime() - t1) / 1e9}%8.2f s  rounds=${res.contractionRounds}")
        org.apache.spark.sql.GraftSqlBridge.releaseLeaf(res.labels)
      }
      val t2 = System.nanoTime()
      noop(graft.operators.TierEleven.classifierScoresOf(docs, Some(pins), Some(v)))
      println(f"[devprobe] a01 scores (shared vocab)            ${(System.nanoTime() - t2) / 1e9}%8.2f s")
      spark.stop(); return
    }

    // ---- q58 decomposition (dedup apply: exact → minhash pairs → CC → semi) ----
    if (args.length > 1 && args(1) == "q58") {
      import graft.operators.{Components, Dedup, Pins, TextOps, TierFour}
      val docs = Tables.load(spark, sfDir, "documents")
      val pins = new Pins
      val distinctDocs = pins(Dedup.exactSurvivors(docs))
      time("q58 exactSurvivors (persist)")(noop(distinctDocs))
      val t0 = pins(TextOps.tokOf(distinctDocs.select("doc_id", "text")))
      time("q58 tokOf")(noop(t0))
      val v = TextOps.vocab(t0, Some(pins))
      time("q58 vocab")(noop(v))
      val pairs = TierFour.minhashPairs(t0, pins)
      time("q58 minhashPairs (full)")(noop(pairs))
      val t1 = System.nanoTime()
      val lbl = Components.connected(
        distinctDocs.select(col("doc_id").as("id")),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      noop(lbl)
      println(f"[devprobe] q58 components                         ${(System.nanoTime() - t1) / 1e9}%8.2f s")
      val keep = lbl.filter(col("id") === col("lbl")).select(col("id").as("doc_id"))
      time("q58 final semi join")(noop(distinctDocs.join(keep, Seq("doc_id"), "left_semi")))
      val pairsP = pairs.persist()
      println("[devprobe] q58 pair count = " + pairsP.count())
      val res = Components.connectedWithStats(
        distinctDocs.select(col("doc_id").as("id")),
        pairsP.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      println(s"[devprobe] q58 CC contractionRounds=${res.contractionRounds} " +
        s"starRounds=${res.starRounds} localSolved=${res.localSolved}")
      val t2 = System.nanoTime()
      noop(res.labels)
      println(f"[devprobe] q58 CC labels noop (pinned pairs)    ${(System.nanoTime() - t2) / 1e9}%8.2f s")
      spark.stop(); return
    }

    // ---- q284 decomposition ----
    {
      import graft.operators.TierHundredTwo
      val sh = TierHundredTwo.bigramsOf(
        Tables.load(spark, sfDir, "documents")).persist()
      time("q284 bigramsOf (sh)")(noop(sh))
      println("[devprobe] sh rows = " + sh.count())
      val sv = Cumulative.rowNumber(spark,
          sh.groupBy("shingle").agg(count(lit(1)).as("df")),
          Seq(col("df"), col("shingle")), "sid")
        .select("shingle", "sid").persist()
      time("q284 shingle rank (sv)")(noop(sv))
      println("[devprobe] sv rows = " + sv.count())
      val arrs = sh.join(broadcast(sv), "shingle")
        .groupBy("doc_id")
        .agg(array_sort(collect_list(col("sid"))).as("sids"),
          count(lit(1)).as("n"))
        .persist()
      time("q284 arrs")(noop(arrs))
      val (num, den) = (9, 10)
      val prefix = arrs.select(col("doc_id").as("pid"), col("n").as("np"),
          explode(expr(
            s"slice(sids, 1, cast(n - floor(($num * n + $den - 1) / $den) + 1 as int))"))
            .as("sid"))
      val full = arrs.select(col("doc_id").as("fid"), col("n").as("nf"),
        explode(col("sids")).as("sid"))
      val cand = prefix.join(full,
          prefix("sid") === full("sid")
            && (col("np") < col("nf")
              || (col("np") === col("nf") && col("pid") < col("fid"))))
        .select(least(col("pid"), col("fid")).as("doc_a"),
          greatest(col("pid"), col("fid")).as("doc_b"))
        .distinct().persist()
      time("q284 cand join+distinct")(noop(cand))
      println("[devprobe] cand rows = " + cand.count())
      time("q284 verify")(noop(cand
        .join(arrs.select(col("doc_id").as("doc_a"), col("sids").as("sa"),
          col("n").as("na")), "doc_a")
        .join(arrs.select(col("doc_id").as("doc_b"), col("sids").as("sb"),
          col("n").as("nb")), "doc_b")
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .filter(col("i") * den >= least(col("na"), col("nb")) * num)
        .select(col("doc_a"), col("doc_b"),
          expr("CAST(1000000 * i DIV least(na, nb) AS BIGINT)")
            .as("containment_ppm"))
        .orderBy("doc_a", "doc_b")))
    }

    spark.stop()
  }
}
