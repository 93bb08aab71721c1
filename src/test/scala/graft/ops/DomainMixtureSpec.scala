package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DomainMixtureSpec extends SparkSpecBase {
  import spark.implicits._

  // "easy" domain = common tokens; "hard" domain = rare-token soup
  private val docs = Seq(
    (0L, "web", "the the the cat sat on the mat"),
    (1L, "web", "the cat sat on the mat again"),
    (2L, "web", "the the mat cat"),
    (3L, "code", "xq7 zz9 qqv jjx wpk"),
    (4L, "code", "zz9 vbn mmq xq7 tty"),
    (5L, "books", "the cat and the mat and zz9")
  ).toDF("doc_id", "source", "text")

  test("weights normalize to 1 and upweight the hard domain") {
    val out = Sampling.domainMixture(docs, "source", "text")
      .orderBy($"source").as[(String, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("books", "code", "web"))
    val weights = out.map(r => r._1 -> r._4).toMap
    assert(math.abs(weights.values.sum - 1.0) < 1e-5)
    // rare-token code domain must get more weight than common-token web
    assert(weights("code") > weights("web"))
    // the easiest domain (largest avg_logprob) anchors excess = 0 and so
    // carries the SMALLEST weight
    val avg = out.map(r => r._1 -> r._3).toMap
    val easiest = avg.maxBy(_._2)._1
    assert(weights(easiest) == weights.values.min)
  }

  test("lower temperature sharpens the mixture") {
    def spread(t: Double): Double = {
      val w = Sampling.domainMixture(docs, "source", "text", temperature = t)
        .select("mixture_weight").as[Double].collect()
      w.max - w.min
    }
    assert(spread(0.25) > spread(2.0))
  }

  test("result is partition-layout independent") {
    val a = Sampling.domainMixture(docs, "source", "text")
      .orderBy($"source").collect().toSeq
    val b = Sampling.domainMixture(docs.repartition(5), "source", "text")
      .orderBy($"source").collect().toSeq
    assert(a == b)
  }

  test("single-domain corpus gets weight 1") {
    val one = Sampling.domainMixture(docs.filter($"source" === "web"),
      "source", "text").select("mixture_weight").as[Double].head()
    assert(one == 1.0)
  }

  test("non-positive temperature rejected") {
    intercept[IllegalArgumentException](
      Sampling.domainMixture(docs, "source", "text", temperature = 0.0))
  }
}
