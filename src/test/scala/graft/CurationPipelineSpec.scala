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
      "n_tokens", "seq_id", "tok_offset", "pos"))
    // no doc appears twice
    assert(out.select("doc_id").distinct().count() == n)
    // splits are the expected three
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // packing invariant: offsets stay inside the budget
    assert(out.filter($"tok_offset" < 0 || $"tok_offset" >= 256).count() == 0)
    // decontamination invariant: no surviving train doc shares an 8-gram
    // with the test split
    val train = out.filter($"split" === "train").select($"doc_id")
      .join(Tables.documents(spark, sfDir), "doc_id")
    val test = out.filter($"split" === "test").select($"doc_id")
      .join(Tables.documents(spark, sfDir), "doc_id")
    val leaks = graft.ops.Decontaminate.contamination(
      train, test, "doc_id", "text", n = 8).filter($"n_hits" > 0)
    assert(leaks.count() == 0, "train must not overlap the held-out test set")
  }

  test("curation is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, sfDir)
    def run(parts: Int): Set[(Long, String, Long, Long)] =
      CurationPipeline.curate(spark, docs.repartition(parts))
        .select("doc_id", "split", "seq_id", "tok_offset")
        .as[(Long, String, Long, Long)].collect().toSet
    assert(run(2) == run(11))
  }

  test("ccnet pipeline (q121): terciles balance within each language, tail is lowest") {
    val out = PipelineQueries.ccnetPipeline(spark, sfDir)
      .collect().map(r => (r.getAs[String]("predicted"), r.getAs[String]("bucket")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("min_lp"), r.getAs[Double]("max_lp"))))
      .toMap
    assert(out.nonEmpty)
    val langs = out.keySet.map(_._1)
    for (l <- langs if Seq("head", "middle", "tail").forall(b => out.contains((l, b)))) {
      val (nh, minH, _) = out((l, "head"))
      val (nm, _, maxM) = out((l, "middle"))
      val (nt, _, maxT) = out((l, "tail"))
      val total = nh + nm + nt
      // terciles: each bucket holds roughly a third (histogram-bound error)
      for ((n, b) <- Seq((nh, "head"), (nm, "middle"), (nt, "tail")))
        assert(n > total / 6 && n < total / 2 + 1, s"$l/$b unbalanced: $n of $total")
      // ordering: every tail doc scores below every head doc
      assert(maxT <= minH, s"$l: tail max $maxT must not exceed head min $minH")
      assert(maxM <= minH, s"$l: middle max $maxM must not exceed head min $minH")
    }
    // determinism across partitionings (the whole composed plan)
    val again = PipelineQueries.ccnetPipeline(spark, sfDir).collect().toSeq
    assert(again == PipelineQueries.ccnetPipeline(spark, sfDir).collect().toSeq)
  }
}
