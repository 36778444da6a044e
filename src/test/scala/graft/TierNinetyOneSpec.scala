package graft

import graft.operators.TierNinetyOne
import org.apache.spark.sql.functions._

/** Tier-91 differentials: q261 against an in-memory Simpson fold (plus
  * the uniform-⇒-D=types and single-type-⇒-D=1 exact laws), q262 against
  * an in-memory hapax fold (plus the injection-discrimination laws: the
  * rareid tokens ARE the hapax set, uncommonx never counts).
  */
class TierNinetyOneSpec extends SparkSpec {
  import spark.implicits._

  private def tokensByLang(augment: Boolean): Seq[(String, String)] =
    Tables.load(spark, sf, "documents")
      .select("lang", "doc_id", "text").collect()
      .flatMap { r =>
        val extra = if (!augment) "" else
          (if (r.getLong(1) % 37 == 0) s" rareid${r.getLong(1)}" else "") +
            (if (r.getLong(1) % 5 == 0) " uncommonx" else "")
        (r.getString(2) + extra).split(" ").filter(_.nonEmpty)
          .map(t => (r.getString(0), t))
      }.toSeq

  test("q261 inverse Simpson ≡ in-memory fold") {
    val cnt = tokensByLang(augment = false)
      .groupBy(identity).map { case ((l, t), xs) => (l, t, xs.size.toLong) }
    val expected = cnt.groupBy(_._1).map { case (l, xs) =>
      val n = xs.map(_._3).sum
      val c2 = xs.map(x => x._3 * x._3).sum
      (l, n, xs.size.toLong, c2, 1000000L * c2 / (n * n), 1000L * n * n / c2)
    }.toSeq.sortBy(_._1)
    val got = TierNinetyOne.q261.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, "q261 must equal the in-memory Simpson fold")
    assert(got.forall(r => r._6 <= r._3 * 1000),
      "effective types never exceed observed types")
  }

  test("simpsonOver laws: uniform ⇒ D = types exactly; single type ⇒ D = 1") {
    val uniform = (for (t <- 'a' to 'e'; _ <- 1 to 4) yield ("g", t.toString)).toSeq
    val u = TierNinetyOne.simpsonOver(uniform.toDF("grp", "token")).collect().head
    assert(u.getLong(5) == 5000L, "5 equally-loaded types ⇒ ens = 5.000")
    val mono = Seq.fill(7)(("g", "x"))
    val m = TierNinetyOne.simpsonOver(mono.toDF("grp", "token")).collect().head
    assert(m.getLong(5) == 1000L && m.getLong(4) == 1000000L,
      "one type ⇒ ens = 1.000, repeat probability = 1")
  }

  test("q262 Good–Turing ≡ in-memory hapax fold; the injection IS the hapax set") {
    val cnt = tokensByLang(augment = true)
      .groupBy(identity).map { case ((l, t), xs) => (l, t, xs.size.toLong) }
    val expected = cnt.groupBy(_._1).map { case (l, xs) =>
      val n = xs.map(_._3).sum
      val hap = xs.count(_._3 == 1L).toLong
      (l, n, xs.size.toLong, hap, 1000000L * hap / n, 1000000L * hap / xs.size)
    }.toSeq.sortBy(_._1)
    val got = TierNinetyOne.q262.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, "q262 must equal the in-memory hapax fold")
    assert(got.map(_._4).sum > 0, "the %37 injection must produce hapax")
    // the hapax are EXACTLY the injected rareid tokens: every natural token
    // and uncommonx is frequent on this corpus
    val hapaxTokens = cnt.filter(_._3 == 1L).map(_._2)
    assert(hapaxTokens.nonEmpty && hapaxTokens.forall(_.startsWith("rareid")),
      "only the injected doc-unique tokens may be singletons")
  }
}
