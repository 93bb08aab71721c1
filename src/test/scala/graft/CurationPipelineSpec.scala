package graft

import graft.examples.CurationPipeline
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("end-to-end curation runs and preserves the contract") {
    val docs = Tables.documents(spark, sfDir)
    val out = CurationPipeline.curate(spark, docs).cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count(), "curation only removes rows")
    // schema contract
    assert(out.columns.toSeq == Seq("doc_id", "lang", "split", "redacted",
      "n_tokens", "seq_id", "tok_offset"))
    // no doc appears twice
    assert(out.select("doc_id").distinct().count() == n)
    // splits are the expected three
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // packing invariant: offsets stay inside the budget
    assert(out.filter($"tok_offset" < 0 || $"tok_offset" >= 256).count() == 0)
  }

  test("curation is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, sfDir)
    def run(parts: Int): Set[(Long, String, Long, Long)] =
      CurationPipeline.curate(spark, docs.repartition(parts))
        .select("doc_id", "split", "seq_id", "tok_offset")
        .as[(Long, String, Long, Long)].collect().toSet
    assert(run(2) == run(11))
  }
}
