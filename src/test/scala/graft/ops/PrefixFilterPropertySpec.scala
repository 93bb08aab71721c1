package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for the prefix-filter completeness theorem that
  * [[Dedup.prefixJaccardJoin]] relies on: for ANY corpus and ANY rational
  * τ = num/den, every pair with Jaccard ≥ τ shares a shingle inside both
  * sides' df-ordered prefixes of length L − ⌈τL⌉ + 1.
  *
  * This mirrors the production arithmetic exactly — the integer ceiling
  * `(L·num + den − 1) div den` and the (df, code) ascending order with
  * code tie-break — over abstract shingle-code sets, so hundreds of cases
  * run without Spark jobs; DedupSpec's differential test then pins the
  * Spark implementation itself against the all-pairs verifier on real
  * text at several seeds and thresholds. Jaccard ≥ τ is checked in exact
  * integers (inter·den ≥ num·union), never via float compare. */
class PrefixFilterPropertySpec extends AnyFunSuite {

  private val genDoc: Gen[Set[Int]] =
    Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 40)).map(_.toSet))

  private val genCorpus: Gen[List[Set[Int]]] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, genDoc))

  private val genTau: Gen[(Int, Int)] =
    for { den <- Gen.chooseNum(2, 10); num <- Gen.chooseNum(1, den) }
      yield (num, den)

  test("prefix-filter completeness holds on >= 300 random corpora and thresholds") {
    val prop = Prop.forAll(genCorpus, genTau) { case (corpus, (num, den)) =>
      // global document frequency per code, as the production join counts it
      val dfm = corpus.flatMap(_.toSeq).groupBy(identity)
        .map { case (c, occ) => c -> occ.size }
      def prefix(s: Set[Int]): Set[Int] = {
        val l = s.size
        val ceilTauL = (l * num + den - 1) / den   // ⌈τL⌉, production integer form
        s.toSeq.sortBy(c => (dfm(c), c)).take(l - ceilTauL + 1).toSet
      }
      corpus.indices.forall { i =>
        (i + 1 until corpus.size).forall { j =>
          val a = corpus(i); val b = corpus(j)
          val inter = (a & b).size
          val union = a.size + b.size - inter
          val aboveTau = inter.toLong * den >= num.toLong * union
          !aboveTau || (prefix(a) & prefix(b)).nonEmpty
        }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"prefix-filter property falsified: $res")
  }

  test("the prefix bound is tight: one fewer element admits false negatives") {
    // witness that L − ⌈τL⌉ (without the +1) is NOT complete: two
    // identical 2-element sets at τ=1/2 have prefix length 2−1+1 = 2;
    // truncating to 1 while df ties break differently would already be
    // unsound for J=1 pairs sharing only their second-ordered element.
    // Construct: A = {x, y}, B = {y, z}, J(A,B) = 1/3 < 1/2 is filtered;
    // but C = D = {x, y} with prefix length 1 share x — the +1 matters
    // when the shared shingle is the LAST prefix slot:
    // A = {a, b, c, d}, B = {c, d, e, f}: J = 2/6 = 1/3, τ = 1/3,
    // ⌈τL⌉ = 2, prefix = 4 − 2 + 1 = 3. With rank order placing the
    // shared {c, d} last (df: a,b,e,f = 1 each; c,d = 2), prefixes
    // {a,b,c} and {e,f,c} intersect at c only BECAUSE of the 3rd slot.
    val a = Set(0, 1, 10, 11); val b = Set(10, 11, 2, 3)
    val dfm = Map(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 1, 10 -> 2, 11 -> 2)
    def prefixN(s: Set[Int], n: Int) = s.toSeq.sortBy(c => (dfm(c), c)).take(n).toSet
    val l = 4; val num = 1; val den = 3
    val full = l - ((l * num + den - 1) / den) + 1  // 3
    assert((prefixN(a, full) & prefixN(b, full)).nonEmpty,
      "complete at the theorem's length")
    assert((prefixN(a, full - 1) & prefixN(b, full - 1)).isEmpty,
      "dropping the +1 slot loses this qualifying pair")
  }
}
