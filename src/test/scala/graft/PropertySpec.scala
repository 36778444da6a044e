package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2 item 4). Pure-logic properties
  * run against the same regex/window arithmetic the Spark plans use, without
  * paying a Spark job per case. Generators come from ScalaCheck, driven by a
  * fixed seed sweep (the scalatest/scalacheck bridge artifact isn't in the
  * offline cache, so cases are enumerated explicitly — deterministic runs as
  * a bonus).
  */
class PropertySpec extends SparkSpec {

  private def cases[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val hashtagRe = "#\\w+".r
  private def tokens(s: String): Seq[String] = hashtagRe.findAllIn(s).toSeq

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(w => "#" + w.take(8)),
    Gen.alphaLowerStr.map(_.take(8)))
  private val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  test("tokenizer: concatenation preserves tokens (F1 flatMap invariance)") {
    cases(Gen.zip(text, text)).foreach { case (a, b) =>
      // words can end in '#', so a bare '#' + following word may fuse into a
      // new token at the seam; both sides' tokens must survive, and the count
      // can only grow by the at-most-one seam token.
      val joined = tokens(a + " " + b)
      assert(joined.size == tokens(a).size + tokens(b).size,
        s"seam changed token count: '$a' + '$b'")
      assert((tokens(a) ++ tokens(b)).forall(joined.contains))
    }
  }

  test("sliding window assignment: every event lands in exactly size/slide windows") {
    val sizeMs = 30000L; val slideMs = 5000L
    cases(Gen.chooseNum(0L, 10000000L)).foreach { t =>
      val starts = (t - sizeMs + 1 to t).filter(_ % slideMs == 0)
      assert(starts.size == (sizeMs / slideMs),
        s"event $t assigned to ${starts.size} windows")
    }
  }

  test("jaccard: symmetric, bounded, 1.0 iff equal sets") {
    val set: Gen[Set[Int]] = Gen.nonEmptyListOf(Gen.chooseNum(0, 50)).map(_.toSet)
    def j(a: Set[Int], b: Set[Int]): Double =
      a.intersect(b).size.toDouble / a.union(b).size
    cases(Gen.zip(set, set)).foreach { case (a, b) =>
      assert(j(a, b) == j(b, a))
      assert(j(a, b) >= 0.0 && j(a, b) <= 1.0)
      assert((j(a, b) == 1.0) == (a == b))
    }
  }

  test("affine minhash family: deterministic, in [0, P), no overflow at max tid") {
    val P = 2147483647L
    cases(Gen.zip(Gen.chooseNum(1L, Int.MaxValue.toLong), Gen.chooseNum(0L, 31L))).foreach {
      case (tid, i) =>
        val a = (2654435761L * (i + 1)) % P
        val b = (40503L * (i + 1)) % P
        val h = (a * tid + b) % P
        assert(h >= 0 && h < P)
        assert(java.lang.Math.multiplyHigh(a, tid) == 0 || a * tid > 0,
          "a*tid must not overflow signed 64-bit")
    }
  }
}
