package graft.ops

import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = (0L until 1000L).toDF("id")

  test("hashSplit is deterministic and roughly proportional") {
    val counts = Sampling.hashSplit(docs, "id", trainPct = 80, valPct = 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
    // rerun → identical assignment
    val again = Sampling.hashSplit(docs, "id").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("splits are disjoint and assignment survives repartitioning") {
    val a = Sampling.hashSplit(docs, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(docs.repartition(13), "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hashSample(p) is a subset consistent with the bucket definition") {
    val sampled = Sampling.hashSample(docs, "id", 10).as[Long].collect().toSet
    val buckets = docs.select($"id", Sampling.hashBucket($"id").as("b"))
      .as[(Long, Long)].collect().toMap
    assert(sampled == buckets.filter(_._2 < 10).keySet)
  }

  test("invalid percentages rejected") {
    intercept[IllegalArgumentException](Sampling.hashSplit(docs, "id", 95, 10))
  }
}
