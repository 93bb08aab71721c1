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

  test("spanCorrupt: splicing targets back into inputs reconstructs the original tokens") {
    // the lossless-pair property: for every doc, replacing <extra_id_b>
    // in the input with target span b yields exactly the normalized
    // token stream — no token lost, duplicated, or reordered, whatever
    // offsets the md5 draws
    val docs = (0 until 12).map { i =>
      (i.toLong, (0 until (5 + i * 3)).map(j => s"w${(j * 7 + i) % 13}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Chunking.spanCorrupt(docs, "doc_id", "text",
        blockLen = 4, spanLen = 2)
      .as[(Long, String, String, Long)].collect()
    assert(out.nonEmpty)
    val texts = docs.as[(Long, String)].collect().toMap
    out.foreach { case (id, inp, tgt, nSpans) =>
      val spans = tgt.split("<extra_id_\\d+>").map(_.trim).filter(_.nonEmpty)
      assert(spans.length == nSpans, s"doc $id: $nSpans spans vs ${spans.toSeq}")
      var rebuilt = inp
      spans.zipWithIndex.foreach { case (sp, b) =>
        rebuilt = rebuilt.replace(s"<extra_id_$b>", sp)
      }
      val orig = texts(id).trim.toLowerCase.replaceAll("\\s+", " ")
      assert(rebuilt.replaceAll("\\s+", " ").trim == orig,
        s"doc $id failed to reconstruct:\n$rebuilt\nvs\n$orig")
    }
    // a doc below one full block is dropped (3 tokens < blockLen 4)
    val short = Seq((99L, "a b c")).toDF("doc_id", "text")
    assert(Chunking.spanCorrupt(short, "doc_id", "text", 4, 2).count() == 0L)
    // partition layout is irrelevant (md5 offsets, no RNG)
    val b = Chunking.spanCorrupt(docs.repartition(5), "doc_id", "text", 4, 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(b.toSeq == out.map(r => Seq(r._1, r._2, r._3, r._4)).sortBy(_.toString).toSeq)
    intercept[IllegalArgumentException](
      Chunking.spanCorrupt(docs, "doc_id", "text", blockLen = 4, spanLen = 4))
  }
}
