package graft.ops

import graft.SparkSpecBase

class ChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunk grid covers the text with the configured overlap") {
    val text = "abcdefghijklmnopqrstuvwxyz" // 26 chars
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunkByChars(df, "doc_id", "text", chunkSize = 10, overlap = 4)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    // step 6: starts 1,7,13,19,25
    assert(chunks.toSeq == Seq(
      "abcdefghij", "ghijklmnop", "mnopqrstuv", "stuvwxyz", "yz"))
    // reassembling non-overlap prefixes reproduces the text
    val rebuilt = chunks.init.map(_.take(6)).mkString + chunks.last
    assert(rebuilt == text)
  }

  test("short document yields exactly one chunk") {
    val df = Seq((1L, "tiny")).toDF("doc_id", "text")
    val chunks = Chunking.chunkByChars(df, "doc_id", "text", 100, 10)
      .select("chunk").as[String].collect()
    assert(chunks.toSeq == Seq("tiny"))
  }

  test("empty and null texts yield zero chunks, not a crash") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ok"))
      .toDF("doc_id", "text")
    val got = Chunking.chunkByChars(df, "doc_id", "text", 10, 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("invalid sizes are rejected") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunking.chunkByChars(df, "doc_id", "text", 10, 10))
  }

  test("chunk fingerprints are stable ids for dedup") {
    val df = Seq((1L, "aaaa bbbb aaaa bbbb")).toDF("doc_id", "text")
    val fps = Chunking.chunkedFingerprints(df, "doc_id", "text", 9, 0)
      .select("chunk_fp").as[String].collect()
    assert(fps.length == 3 && fps.distinct.length >= 2)
  }

  test("chunkByTokens: window/overlap grid over tokens, messy whitespace normalized") {
    val df = Seq((1L, "  a  b c d e f G ")).toDF("doc_id", "text") // 7 tokens
    val got = Chunking.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 2)
      .select("chunk_idx", "chunk", "n_tokens")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // step 2 → windows at tokens 1, 3, 5, 7 (tail windows shorter)
    assert(got == Seq(
      (0L, "a b c d", 4L), (1L, "c d e f", 4L),
      (2L, "e f g", 3L), (3L, "g", 1L)))
    // empty and null text produce no chunks
    val empty = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Chunking.chunkByTokens(empty, "doc_id", "text", 4, 2).count() == 0L)
  }
}
