package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token count on normalized text") {
    val df = Seq((0L, "  a  b   c "), (1L, "single"), (2L, "x y")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 3, 1L -> 1, 2L -> 2))
  }

  test("subword count heuristic splits long words and digits") {
    val df = Seq((0L, "internationalization 12345 ok!")).toDF("doc_id", "text")
    // internationalization (20 chars) → 3 chunks of ≤8; 12345 → 2 chunks of ≤3; ok → 1; ! → 1
    val got = df.select(TextAnalysis.subwordCount($"text")).as[Int].head()
    assert(got == 7)
  }

  test("quality metrics: ratios and buckets") {
    val good = ("g" * 0) + Seq.fill(60)("spark data").mkString(" ") // 120 tokens, vowels present
    val df = Seq((0L, good), (1L, "short doc here now ok yes no maybe so forth ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
      (2L, "tiny")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityMetrics(df, "doc_id", "text")
      .select("doc_id", "quality").as[(Long, String)].collect().toMap
    assert(rows(0L) == "good")
    assert(rows(1L) == "fair")
    assert(rows(2L) == "short")
  }

  test("langid heuristic: marker words vote; und when no markers") {
    val df = Seq(
      (0L, "the cat sat on the mat and looked to the sky"),
      (1L, "der hund und die katze ist ein freund"),
      (2L, "le chat et la souris est une histoire"),
      (3L, "qwerty zxcvb asdfgh")).toDF("doc_id", "text")
    val got = TextAnalysis.langIdScores(df, "text")
      .select($"doc_id", $"predicted").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "und"))
  }

  test("fingerprints: md5 of normalized text, stable under whitespace") {
    val df = Seq((0L, "Hello   World"), (1L, "hello world")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text")
      .select("fp").as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }
}
