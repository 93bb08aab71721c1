package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def unitVec(dir: Int, eps: Float): Array[Float] = {
    val v = new Array[Float](8)
    v(dir) = 1f
    v((dir + 1) % 8) = eps
    v
  }

  test("prune policy: earlier near-dup in the cell prunes, orthogonal survives") {
    // nc=1 puts everything in one cell, isolating the prune policy itself:
    // ids 0/1/2 are near-identical (cos ~1), ids 10/11 near-identical on an
    // orthogonal axis, id 20 unique. Expected pruned: 1,2 (trigger_id 0) and
    // 11 (trigger_id 10); cross-axis cosines are ~0, far below τ.
    val e = Seq(
      0L -> unitVec(0, 0.00f), 1L -> unitVec(0, 0.01f), 2L -> unitVec(0, 0.02f),
      10L -> unitVec(3, 0.00f), 11L -> unitVec(3, 0.01f),
      20L -> unitVec(6, 0.00f)
    ).toDF("vec_id", "embedding")
    val got = SemDedup.prunedWithinCells(e, "vec_id", "embedding",
        nc = 1, iters = 1, threshold = 0.9)
      .select($"vec_id", $"trigger_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 11L -> 10L))
  }

  test("matches a naive driver-side recompute on real embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    val got = SemDedup.prunedWithinCells(e, "vec_id", "embedding",
        nc = 8, iters = 2, threshold = 0.4)
      .select($"vec_id", $"cell", $"trigger_id", $"max_sim")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // independent path: same deterministic training, then the pairwise
    // scan done naively on the driver
    val model = Ivf.train(e.select($"vec_id".as("id"), $"embedding".as("v")),
      "id", "v", nc = 8, iters = 2)
    val rows = Ivf.assign(e, "embedding", model)
      .select($"vec_id", $"embedding", $"ivf_cell".cast("long"))
      .as[(Long, Seq[Float], Long)].collect().sortBy(_._1)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long, Double)]
    for {
      (bId, bv, bCell) <- rows
      (aId, av, aCell) <- rows if aId < bId && aCell == bCell
    } {
      val sim = BigDecimal(cos(av, bv)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (sim >= 0.4) {
        val cur = want.get(bId)
        want(bId) = (bCell,
          cur.fold(aId)(c => math.min(c._2, aId)),
          cur.fold(sim)(c => math.max(c._3, sim)))
      }
    }
    assert(got.keySet == want.keySet, "pruned id sets differ")
    got.foreach { case (id, (cell, kept, sim)) =>
      val (wCell, wKept, wSim) = want(id)
      assert(cell == wCell && kept == wKept, s"vec $id cell/kept differ")
      assert(math.abs(sim - wSim) < 1e-9, s"vec $id sim $sim vs $wSim")
    }
  }
}
