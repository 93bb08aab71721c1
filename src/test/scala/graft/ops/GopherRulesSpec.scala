package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpecBase {
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away with great speed to find more food that it can have"

  private val docs = Seq(
    (0L, good),                                   // passes all rules
    (1L, "too short to pass"),                    // fails word count
    (2L, ("a " * 30).trim),                       // mean word len 1 → fails
    (3L, good.replaceAll("\\b(the|and|to|that|have|with|of|be)\\b", "x")), // no stop hits
    (4L, ("12345 67890 " * 15).trim),             // numeric → fails alpha
    (5L, "")                                      // empty → absent
  ).toDF("doc_id", "text")

  test("per-rule flags fire for the crafted failures; good doc keeps") {
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(5L), "empty doc must be absent")
    def flags(id: Long) = (out(id).getLong(5), out(id).getLong(6),
      out(id).getLong(7), out(id).getLong(8), out(id).getLong(9))
    assert(flags(0L) == (1L, 1L, 1L, 1L, 1L), s"good doc: ${flags(0L)}")
    assert(flags(1L)._1 == 0L && flags(1L)._5 == 0L, "short doc fails r_words")
    assert(flags(2L)._2 == 0L && flags(2L)._5 == 0L, "1-char words fail r_meanlen")
    assert(flags(3L)._4 == 0L && flags(3L)._5 == 0L, "stopword-free doc fails r_stop")
    assert(flags(4L)._3 == 0L && flags(4L)._5 == 0L, "numeric doc fails r_alpha")
  }

  test("report columns replay a by-hand computation") {
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .filter($"doc_id" === 0L).head()
    val w = good.toLowerCase.split("\\s+").toSeq
    assert(r.getLong(1) == w.size.toLong)
    val mean = BigDecimal(w.map(_.length).sum.toDouble / w.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == mean)
    assert(r.getDouble(3) == 1.0) // every word alphabetic
  }

  test("keep bit is the conjunction of the four rules") {
    val rows = TextAnalysis.gopherRules(docs, "doc_id", "text").collect()
    rows.foreach { r =>
      assert(r.getLong(9) ==
        r.getLong(5) * r.getLong(6) * r.getLong(7) * r.getLong(8))
    }
  }

  test("map-only: the plan contains no exchange") {
    val p = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"gopherRules must not shuffle:\n$p")
  }

  test("invalid bounds rejected") {
    intercept[IllegalArgumentException](
      TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 30, maxWords = 10))
  }
}
