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

    // ---- q154 decomposition (co-purchase recs: cs → salted pairs → cap → score) ----
    // Stages persist, so each is timed on its FIRST materialization (cold
    // stage over warm upstream caches) — time()'s warm-second protocol
    // would just read the cache back.
    if (args.length > 1 && args(1) == "q154") {
      import graft.operators.Skew
      import org.apache.spark.sql.expressions.Window
      def timeCold(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[devprobe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val cs = Tables.load(spark, sfDir, "orders")
        .join(Tables.load(spark, sfDir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("su")).distinct()
        .persist()
      timeCold("q154 cs build (orders⋈lineitem distinct)")(noop(cs))
      println("[devprobe] cs rows = " + cs.count())
      val pairsRaw = Skew.saltedCoPairs(cs, col("c"), col("su"))
      timeCold("q154 salted pair rows (count)")(
        println("[devprobe] pair rows = " + pairsRaw.count()))
      // full-direction aggregation (pre-r15 shape) vs half + mirror
      time("q154 wall agg FULL (both directions)")(noop(pairsRaw
        .groupBy(col("ia").as("s_a"), col("ib").as("s_b"))
        .agg(count(lit(1)).as("shared"))))
      time("q154 wall agg HALF (ia<ib)")(noop(
        Skew.saltedCoPairsHalf(cs, col("c"), col("su"))
          .groupBy(col("ia").as("s_a"), col("ib").as("s_b"))
          .agg(count(lit(1)).as("shared"))))
      val wall = pairsRaw
        .groupBy(col("ia").as("s_a"), col("ib").as("s_b"))
        .agg(count(lit(1)).as("shared")).persist()
      timeCold("q154 wall (salted pairs + groupBy)")(noop(wall))
      println("[devprobe] wall rows = " + wall.count())
      val w = wall.withColumn("nrk", row_number().over(
          Window.partitionBy("s_a").orderBy(col("shared").desc, col("s_b"))))
        .filter(col("nrk") <= 32).drop("nrk").persist()
      timeCold("q154 neighbor cap window")(noop(w))
      // anti-before-agg (pre-r15 shape) vs agg-before-anti, warm, NEITHER
      // persisted first (a persisted same-plan twin would satisfy the
      // other's cache lookup and time a cache read)
      time("q154 scoring ANTI-then-AGG")(noop(
        cs.join(broadcast(w), col("su") === col("s_a"))
          .join(cs.select(col("c").as("oc"), col("su").as("os")),
            col("oc") === col("c") && col("os") === col("s_b"), "left_anti")
          .groupBy(col("c"), col("s_b").as("cand"))
          .agg(sum("shared").as("score"))))
      time("q154 scoring AGG-then-ANTI")(noop(
        cs.join(broadcast(w), col("su") === col("s_a"))
          .groupBy(col("c"), col("s_b").as("cand"))
          .agg(sum("shared").as("score"))
          .join(cs.select(col("c").as("oc"), col("su").as("os")),
            col("oc") === col("c") && col("os") === col("cand"), "left_anti")))
      val sc = cs.join(broadcast(w), col("su") === col("s_a"))
        .join(cs.select(col("c").as("oc"), col("su").as("os")),
          col("oc") === col("c") && col("os") === col("s_b"), "left_anti")
        .groupBy(col("c"), col("s_b").as("cand"))
        .agg(sum("shared").as("score")).persist()
      timeCold("q154 scoring join + anti + agg (persist)")(noop(sc))
      println("[devprobe] sc rows = " + sc.count())
      timeCold("q154 top-3 window + orderBy (cold)")(noop(
        sc.withColumn("rk", row_number().over(
            Window.partitionBy("c").orderBy(col("score").desc, col("cand"))))
          .filter(col("rk") <= 3)
          .select(col("c").as("cust"), col("cand").as("supp"), col("score"))
          .orderBy(col("cust"), col("score").desc, col("supp"))))
      time("q154 top-3 window + orderBy (warm)")(noop(
        sc.withColumn("rk", row_number().over(
            Window.partitionBy("c").orderBy(col("score").desc, col("cand"))))
          .filter(col("rk") <= 3)
          .select(col("c").as("cust"), col("cand").as("supp"), col("score"))
          .orderBy(col("cust"), col("score").desc, col("supp"))))
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
