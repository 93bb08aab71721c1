package graft.ops

import graft.SparkSpecBase

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(seed: Int, dim: Int = 16): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2 - 1)
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    d / (na * nb)
  }

  test("bruteForceTopK matches a naive scala computation") {
    val cands = (0 until 50).map(i => (i.toLong, vec(i))).toDF("n_id", "nv")
    val queries = Seq((100L, vec(1000)), (101L, vec(1001))).toDF("q_id", "qv")
    val got = Similarity.bruteForceTopK(queries, cands, 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rnk")) ->
        r.getAs[Long]("n_id")).toMap
    for (qSeed <- Seq(1000, 1001)) {
      val qv = vec(qSeed)
      val expected = (0 until 50).map(i => i.toLong -> cos(vec(i), qv))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      val qid = qSeed - 900L
      expected.zipWithIndex.foreach { case (nid, rank) =>
        assert(got((qid, rank + 1)) == nid, s"q$qid rank ${rank + 1}")
      }
    }
  }

  test("SRP bucketing: identical vectors share a bucket; buckets bounded by 2^planes") {
    val df = (0 until 20).map(i => (i.toLong, vec(i % 10))).toDF("n_id", "nv")
    val bucketed = Similarity.withBucket(df, "nv", numPlanes = 8, dim = 16)
    val buckets = bucketed.select("n_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert((0 until 10).forall(i => buckets(i.toLong) == buckets(i.toLong + 10)))
    assert(buckets.values.forall(b => b >= 0 && b < 256))
  }

  test("lshBucketTopK finds an identical vector (self-similarity 1.0)") {
    val cands = (0 until 200).map(i => (i.toLong, vec(i))).toDF("n_id", "nv")
    val queries = Seq((999L, vec(7))).toDF("q_id", "qv") // identical to candidate 7
    val got = Similarity.lshBucketTopK(queries, cands, k = 3,
      numPlanes = 10, dim = 16)
      .collect().map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("n_id")))
    assert(got.nonEmpty && got.minBy(_._1)._2 == 7L)
  }

  test("bucketedNearDupPairs: subset of exact pairs; full recall on planted dups") {
    val base = (0 until 60).map(i => (i.toLong, vec(i)))
    // three exact copies — true near-dups (θ=0) must ALWAYS be found
    val planted = base ++ Seq((100L, vec(3)), (101L, vec(17)), (102L, vec(42)))
    val df = planted.toDF("id", "embedding")
    val exact = Similarity.nearDupPairs(df, "id", "embedding", 0.2)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val bucketed = Similarity.bucketedNearDupPairs(df, "id", "embedding", 0.2,
      numPlanes = 5, dim = 16, numTables = 10)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(bucketed.subsetOf(exact), "bucketed candidates must verify exactly")
    assert(Set((3L, 100L), (17L, 101L), (42L, 102L)).subsetOf(bucketed),
      "identical vectors share every bucket — recall 1.0 for true dups")
  }

  test("bucketedNearDupPairs plans an equi-join — no cartesian, no nested loop") {
    val df = (0 until 40).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
    val p = Similarity.bucketedNearDupPairs(df, "id", "embedding", 0.5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"bucketed near-dup must join on (table, bucket):\n$p")
  }

  test("nearDupPairs finds planted duplicates at high threshold") {
    val base = (0 until 30).map(i => (i.toLong, vec(i)))
    val planted = base :+ (100L, vec(3)) // exact copy of id 3
    val got = Similarity.nearDupPairs(
      planted.toDF("id", "embedding"), "id", "embedding", 0.99)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(got == Set((3L, 100L)))
  }
}
