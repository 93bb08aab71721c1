package graft.ops

import graft.{PipelineQueries, SparkSpecBase, Tables}
import graft.expr.{DedupKernel, VectorExprs}
import org.apache.spark.sql.functions._

/** End-to-end RAG pipeline (q64): chunk → portable embed → cosine top-k
  * with doc dedup. Pins the retrieval semantics a user relies on. */
class RagSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("polyEmbed: deterministic, partition-independent, null on empty") {
    val df = Seq("spark join shuffle", "spark join shuffle", "other words", "")
      .toDF("t")
    val embs = df.select(DedupKernel.polyEmbedCol($"t").as("e"))
      .collect().map(r => Option(r.getSeq[Float](0)).map(_.toSeq))
    assert(embs(0).isDefined && embs(0) == embs(1), "same text, same vector")
    assert(embs(0) != embs(2), "different text, different vector")
    assert(embs(3).isEmpty, "zero tokens embed to null")
    val repart = Seq.fill(50)("spark join shuffle").toDF("t").repartition(7)
      .select(DedupKernel.polyEmbedCol($"t").as("e"))
      .collect().map(_.getSeq[Float](0).toSeq).distinct
    assert(repart.size == 1, "embedding must not depend on partitioning")
  }

  test("self-retrieval: a doc's own chunk text retrieves that doc at rank 1, sim 1") {
    val chunks = Chunking.chunkByTokens(Tables.documents(spark, sfDir),
        "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
      .select($"doc_id", $"chunk_idx",
        DedupKernel.polyEmbedCol($"chunk").as("emb"))
    val probe = chunks.filter($"doc_id" === 5 && $"chunk_idx" === 0)
      .select($"emb".as("qemb"))
    val top = chunks.crossJoin(broadcast(probe))
      .withColumn("sim", round(VectorExprs.cosine($"emb", $"qemb"), 6))
      .orderBy($"sim".desc, $"doc_id", $"chunk_idx")
      .limit(1)
      .select($"doc_id", $"sim")
      .head()
    assert(top.getLong(0) == 5L, s"expected doc 5 at rank 1, got ${top.getLong(0)}")
    assert(top.getDouble(1) == 1.0, s"self-similarity must be 1.0, got ${top.getDouble(1)}")
  }

  test("q64 returns 5 docs per query, no duplicate docs, descending sims") {
    val rows = PipelineQueries.ragTopK(spark, sfDir)
      .select($"q_id", $"doc_id", $"sim", $"rnk")
      .as[(Long, Long, Double, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"q$q returned ${rs.length} rows")
      assert(rs.map(_._2).distinct.length == 5, s"q$q has duplicate docs")
      val ordered = rs.sortBy(_._4).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"q$q sims not descending: ${ordered.toSeq}")
    }
  }
}
