package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Quantifies the ANN path: recall@k of SRP-LSH (multi-probe) vs the exact
  * brute-force top-k on the real testdata embeddings. */
class AnnRecallSpec extends SparkSpecBase {
  import spark.implicits._

  test("lshBucketTopK recall@5 >= 0.5 on sf0.001 embeddings (multi-probe, 6 planes)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val cands = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val exact = Similarity.bruteForceTopK(qs, cands, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshBucketTopK(qs, cands, 5, numPlanes = 6, dim = 64)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.2f (${approx.size} approx results)")
    assert(recall >= 0.5, f"recall@5 $recall%.2f below 0.5")
  }
}
