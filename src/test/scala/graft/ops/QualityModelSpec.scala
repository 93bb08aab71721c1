package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "Completely   Different TEXT with  odd spacing"),
    (3L, "one"),   // single token → no bigrams
    (4L, ""),      // empty → no features, absent from result
    (5L, "aa bb")
  ).toDF("doc_id", "text")

  test("score replays a by-hand feature walk (unigrams + bigrams)") {
    val out = QualityModel.classifierScore(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Long)].collect()

    // naive reference: same tokenizer, same hash, same LCG weights
    def polyFold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * graft.expr.DedupKernel.B1 + c.toLong) %
        graft.expr.DedupKernel.P)
    def weight(b: Long): Long =
      ((b * QualityModel.WeightMul + QualityModel.WeightAdd) %
        QualityModel.WeightMod) - QualityModel.WeightHalf
    def expected(text: String): Option[(Long, Double, Long)] = {
      val w = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
      val feats = (w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .filter(_.nonEmpty)
      if (feats.isEmpty) None else {
        val sm = feats.map(f => weight(polyFold(f) % QualityModel.NumBuckets)).sum
        Some((feats.size.toLong,
          BigDecimal(sm.toDouble / (feats.size.toDouble * 1e6d))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (sm > 0) 1L else 0L))
      }
    }

    val byId = out.map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(!byId.contains(4L), "empty doc must be absent")
    for (id <- Seq(0L, 1L, 2L, 3L, 5L)) {
      val text = Seq("the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "Completely   Different TEXT with  odd spacing", "one", "", "aa bb")(id.toInt)
      assert(byId.get(id).contains(expected(text).get), s"doc $id")
    }
    // identical text → identical score
    assert(byId(0L) == byId(1L))
  }

  test("single-token doc scores on its unigram only") {
    val row = QualityModel.classifierScore(docs, "doc_id", "text")
      .filter($"doc_id" === 3L).as[(Long, Long, Double, Long)].head()
    assert(row._2 == 1L)
  }

  test("result is partition-layout independent") {
    val a = QualityModel.classifierScore(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    val b = QualityModel.classifierScore(docs.repartition(7), "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("weight table covers every bucket exactly once, centered range") {
    val w = QualityModel.weightTable(spark).as[(Long, Long)].collect()
    assert(w.length == QualityModel.NumBuckets)
    assert(w.map(_._1).toSet == (0L until QualityModel.NumBuckets.toLong).toSet)
    assert(w.forall { case (_, m) =>
      m >= -QualityModel.WeightHalf && m <= QualityModel.WeightHalf })
    // not degenerate: both signs present
    assert(w.exists(_._2 > 0) && w.exists(_._2 < 0))
  }

  test("kernel feature buckets ≡ portable explode+hash pipeline") {
    val extra = Seq(
      (10L, "solo"), (11L, "a b"), (12L, "many tokens make many bigrams here"),
      (13L, "Unicode √ß∂ tokens æøå mixed"), (14L, "")
    ).toDF("doc_id", "text")
    val all = docs.unionByName(extra)
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("doc_id", "bucket").count()
        .as[(Long, Long, Long)].collect().toSet
    val kernel = multiset(QualityModel.hashedFeatures(all, "doc_id", "text"))
    val portable = multiset(QualityModel.hashedFeaturesPortable(all, "doc_id", "text"))
    assert(kernel == portable)
  }

  test("invalid bucket count rejected") {
    intercept[IllegalArgumentException](
      QualityModel.hashedFeatures(docs, "doc_id", "text", k = 0))
  }
}
