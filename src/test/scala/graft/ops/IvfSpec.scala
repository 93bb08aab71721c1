package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer ANN: determinism, plan shape, and recall against
  * the exact brute-force top-k on the real testdata embeddings. */
class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id".as("id"), $"embedding".as("v"))

  test("training is deterministic and partition-layout-independent") {
    val a = Ivf.train(corpus, "id", "v", nc = 8, iters = 2)
    val b = Ivf.train(corpus.repartition(13), "id", "v", nc = 8, iters = 2)
    assert(a.centroids.length == 8)
    (a.centroids zip b.centroids).foreach { case (x, y) =>
      assert(x.toSeq == y.toSeq)
    }
  }

  test("assignment is map-only (no exchange) and covers every row with a valid cell") {
    val m = Ivf.train(corpus, "id", "v", nc = 8, iters = 1)
    val assigned = Ivf.assign(corpus, "v", m)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val cells = assigned.select($"ivf_cell").as[Int].collect()
    assert(cells.length == 500)
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(cells.distinct.length > 1, "degenerate quantizer: one cell")
  }

  test("probeCells returns the nprobe truly nearest centroids") {
    val m = Ivf.train(corpus, "id", "v", nc = 8, iters = 2)
    val row = corpus.limit(1)
      .select(Ivf.probeCells($"v", m, 3).as("p"), $"v")
      .head()
    val probes = row.getSeq[Int](0)
    val raw = row.getSeq[Float](1).toArray
    // mirror the kernel: distances are measured in unit space
    val norm = math.sqrt(raw.map(x => x.toDouble * x).sum)
    val v = if (norm == 0) raw else raw.map(x => (x / norm).toFloat)
    def l2(a: Array[Float], b: Array[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    val byDist = m.centroids.zipWithIndex
      .sortBy { case (c, i) => (l2(v, c), i) }.map(_._2).take(3).toSeq
    assert(probes == byDist)
  }

  test("persisted index: model roundtrips exactly; probeIndex == inline topK; probe scan prunes partitions") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val cands = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(cands.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 16, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf_spec").toString
    Ivf.writeIndex(cands, "nv", m, path)
    val loaded = Ivf.loadModel(spark, path)
    (m.centroids zip loaded.centroids).foreach { case (x, y) =>
      assert(x.toSeq == y.toSeq, "persisted quantizer must roundtrip bit-exactly")
    }
    val inline = Ivf.topK(qs, cands, m, k = 5, nprobe = 6)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val probed = Ivf.probeIndex(spark, path, qs, k = 5, nprobe = 6)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(probed == inline, "prebuilt-index probe must reproduce the inline result")
    // the probe's cells scan must partition-prune to the probed cells
    // only — pin the literal INSET AND that it lists fewer cells than
    // the index holds (a refactor that silently full-scans would either
    // drop the filter or list all 16)
    val scan = Ivf.probeIndex(spark, path, qs, k = 5, nprobe = 6)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("ivf_cell"),
      s"expected ivf_cell partition filters on the cells scan:\n$scan")
    // a single query at nprobe=2 must read exactly its 2 cells, not 16
    val narrow = Ivf.probeIndex(spark, path, qs.limit(1), k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    // few values print as IN (a,b); >= 10 convert to INSET a, b, ...
    val inset = "ivf_cell#\\d+ IN(?:SET)? \\(?([0-9, ]+)\\)?".r.findFirstMatchIn(narrow)
    assert(inset.isDefined, s"expected a literal IN/INSET partition filter:\n$narrow")
    val nCells = inset.get.group(1).split(",").count(_.trim.nonEmpty)
    assert(nCells == 2,
      s"1 query at nprobe=2 must read exactly 2 of 16 cells, got $nCells")
  }

  test("probeIndexBatch: join-based probe prunes via DPP, no driver collect, same results") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val cands = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(cands.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 16, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf_batch_spec").toString
    Ivf.writeIndex(cands, "nv", m, path)
    val viaLiteral = Ivf.probeIndex(spark, path, qs, k = 5, nprobe = 6)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val batch = Ivf.probeIndexBatch(spark, path, qs, k = 5, nprobe = 6)
    val viaJoin = batch
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(viaJoin == viaLiteral,
      "join-based probe must reproduce the literal-filter probe exactly")
    // the scan's partition filter must be DYNAMIC (runtime-pruned from the
    // broadcast probe side), proving no plan-time driver collect happened
    val p = batch.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression partition filter:\n$p")
  }

  test("appendToIndex: append-without-retrain == one-shot build of the union under the same model") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val old = e.filter($"vec_id" >= 10 && $"vec_id" < 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val fresh = e.filter($"vec_id" >= 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val union = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(old.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 8, iters = 2)
    // path A: build on old, append the new batch under the frozen model
    val pa = java.nio.file.Files.createTempDirectory("ivf_append_a").toString
    Ivf.writeIndex(old, "nv", m, pa)
    Ivf.appendToIndex(fresh, "nv", pa)
    // path B: one-shot index of the union under the SAME model
    val pb = java.nio.file.Files.createTempDirectory("ivf_append_b").toString
    Ivf.writeIndex(union, "nv", m, pb)
    // identical cell contents...
    val cellsA = Ivf.readCells(spark, pa)
      .select($"n_id", $"ivf_cell".cast("int")).as[(Long, Int)].collect().toSet
    val cellsB = Ivf.readCells(spark, pb)
      .select($"n_id", $"ivf_cell".cast("int")).as[(Long, Int)].collect().toSet
    assert(cellsA == cellsB, "appended assignment diverged from one-shot build")
    // ...and identical probe results
    val a = Ivf.probeIndex(spark, pa, qs, k = 5, nprobe = 3)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val b = Ivf.probeIndex(spark, pb, qs, k = 5, nprobe = 3)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(a == b, "probe-after-append must equal probe of the one-shot union index")
  }

  test("time travel: probeIndexAt(pre-append version) ≡ an index that never saw the append") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val old = e.filter($"vec_id" >= 10 && $"vec_id" < 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val fresh = e.filter($"vec_id" >= 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(old.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 8, iters = 2)
    val split = java.nio.file.Files.createTempDirectory("ivf_tt_a").toString
    Ivf.writeIndex(old, "nv", m, split)      // v1
    Ivf.appendToIndex(fresh, "nv", split)    // v2
    val historic = java.nio.file.Files.createTempDirectory("ivf_tt_b").toString
    Ivf.writeIndex(old, "nv", m, historic)
    def coll(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val atV1 = coll(Ivf.probeIndexAt(spark, split, 1L, qs, k = 5, nprobe = 3))
    val freshBuild = coll(Ivf.probeIndex(spark, historic, qs, k = 5, nprobe = 3))
    assert(atV1 == freshBuild, "v1 snapshot diverged from the historic build")
    val atV2 = coll(Ivf.probeIndexAt(spark, split, 2L, qs, k = 5, nprobe = 3))
    val current = coll(Ivf.probeIndex(spark, split, qs, k = 5, nprobe = 3))
    assert(atV2 == current)
    assert(atV1 != atV2, "the appended vectors must change some top-5 list")
    intercept[IllegalArgumentException] {
      Ivf.probeIndexAt(spark, split, 8L, qs, k = 5, nprobe = 3)
    }
  }

  test("compact merges cells deltas into one; probes and model are unchanged") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val old = e.filter($"vec_id" >= 10 && $"vec_id" < 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val fresh = e.filter($"vec_id" >= 300 && $"vec_id" < 400)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(old.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 8, iters = 2)
    val p = java.nio.file.Files.createTempDirectory("ivf_compact").toString
    Ivf.writeIndex(old, "nv", m, p)
    Ivf.appendToIndex(fresh, "nv", p)
    assert(Manifest.livePaths(spark, p).size == 2)
    def probe() = Ivf.probeIndex(spark, p, qs, k = 5, nprobe = 3)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val before = probe()
    val modelBefore = Ivf.loadModel(spark, p)
    Ivf.compact(spark, p)
    assert(Manifest.livePaths(spark, p).size == 1,
      "compaction must leave exactly one live delta")
    assert(probe() == before, "probe diverged across compaction")
    (modelBefore.centroids zip Ivf.loadModel(spark, p).centroids).foreach {
      case (x, y) => assert(x.toSeq == y.toSeq, "model lost in compaction")
    }
    // staleness audit still works (stats carried through)
    assert(Ivf.indexStaleness(spark, p).count() > 0)
    // idempotent on a single delta
    val v = Manifest.current(spark, p).version
    Ivf.compact(spark, p)
    assert(Manifest.current(spark, p).version == v)
  }

  test("indexStaleness: per-cell counts are exact; drifted appends raise mean error") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val old = e.filter($"vec_id" >= 10 && $"vec_id" < 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(old.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 8, iters = 2)
    val p = java.nio.file.Files.createTempDirectory("ivf_stale").toString
    Ivf.writeIndex(old, "nv", m, p)
    val before = Ivf.indexStaleness(spark, p).as[(Int, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(before.values.map(_._1).sum == 290L, "counts must cover every row")
    assert(before.values.forall(_._2 >= 0.0))
    // append an adversarial batch: constant far-off vectors all landing
    // in one cell -> that cell's count and the global mean error jump
    val drift = Seq.tabulate(100) { i =>
      (10000L + i, Array.tabulate(64)(d => if (d == 0) 1f else 0.9f))
    }.toDF("n_id", "nv")
    Ivf.appendToIndex(drift, "nv", p)
    val after = Ivf.indexStaleness(spark, p).as[(Int, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after.values.map(_._1).sum == 390L)
    val bloated = after.filter { case (c, (n, _)) => n - before(c)._1 >= 100L }
    assert(bloated.size == 1, s"drift batch must bucket into one cell: $after")
    val (cell, (_, errAfter)) = bloated.head
    assert(errAfter > before(cell)._2,
      f"mean_err must rise in the bloated cell: ${before(cell)._2}%.4f -> $errAfter%.4f")
  }

  test("rebuildIfStale: within budget leaves the index untouched; drift rebuilds and swaps atomically") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val old = e.filter($"vec_id" >= 10 && $"vec_id" < 300)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(old.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 8, iters = 2)
    val p = java.nio.file.Files.createTempDirectory("ivf_rebuild").toString
    Ivf.writeIndex(old, "nv", m, p)
    // fresh index: healthy — audit must be a no-op
    val healthy = Ivf.rebuildIfStale(spark, p)
    assert(!healthy.rebuilt, healthy.reason)
    val modelBefore = Ivf.loadModel(spark, p)
    (m.centroids zip modelBefore.centroids).foreach { case (x, y) =>
      assert(x.toSeq == y.toSeq, "no-op audit must not touch the model")
    }
    // adversarial append: constant far-off vectors bucket into one cell,
    // raising both mean_err and the hottest cell's share past budget
    val drift = Seq.tabulate(150) { i =>
      (10000L + i, Array.tabulate(64)(d => if (d == 0) 1f else 0.9f))
    }.toDF("n_id", "nv")
    Ivf.appendToIndex(drift, "nv", p)
    val liveBefore = Manifest.livePaths(spark, p)
    val decision = Ivf.rebuildIfStale(spark, p)
    assert(decision.rebuilt, s"drifted index must rebuild: ${decision.reason}")
    assert(decision.current.meanErr > decision.baseline.meanErr)
    // the manifest flip dropped the old deltas but kept them on disk
    // (age-gated gc) for in-flight readers — the `.prev` retention,
    // generalized; and the rebuilt index is ONE delta
    assert(Manifest.livePaths(spark, p).size == 1,
      "rebuild must commit removeAll: exactly one live delta")
    assert(liveBefore.forall(q =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(q))),
      "previous index version must survive the swap until gc age-out")
    // the rebuilt index == a fresh one-shot build of the union corpus
    // (train is deterministic on the same rows, so the swap is invisible
    // to probes beyond the improved geometry)
    val union = old.unionByName(drift)
    val m2 = Ivf.train(union.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 8, iters = 2)
    val pb = java.nio.file.Files.createTempDirectory("ivf_rebuild_fresh").toString
    Ivf.writeIndex(union, "nv", m2, pb)
    val swapped = Ivf.loadModel(spark, p)
    (m2.centroids zip swapped.centroids).foreach { case (x, y) =>
      assert(x.toSeq == y.toSeq,
        "rebuilt quantizer must equal a fresh train on the union corpus")
    }
    val viaRebuilt = Ivf.probeIndex(spark, p, qs, k = 5, nprobe = 3)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val viaFresh = Ivf.probeIndex(spark, pb, qs, k = 5, nprobe = 3)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(viaRebuilt == viaFresh,
      "probe after rebuild-swap must equal probe of a fresh union build")
    // post-rebuild the baseline is re-snapshotted: the audit is quiet again
    val after = Ivf.rebuildIfStale(spark, p)
    assert(!after.rebuilt, s"freshly rebuilt index must audit clean: ${after.reason}")
  }

  // The testdata embeddings are uniform random unit vectors (norms == 1.0,
  // no cluster structure) — the worst case for any cell-based ANN, where
  // recall ~= scan fraction (measured curve: nc=16 gives 0.42/0.64/0.76
  // recall at nprobe 4/6/8). On real clustered embeddings the cells carry
  // far more signal; this spec pins the uniform-data floor.
  test("ivf topK recall@5 >= 0.5 vs brute force on sf0.001 embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"))
    val cands = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("n_id"), $"embedding".as("nv"))
    val m = Ivf.train(cands.select($"n_id".as("id"), $"nv".as("v")), "id", "v",
      nc = 16, iters = 2)
    val exact = Similarity.bruteForceTopK(qs, cands, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.topK(qs, cands, m, k = 5, nprobe = 6)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.2f (${approx.size} approx results, nprobe=6/16 cells)")
    assert(recall >= 0.5, f"recall@5 $recall%.2f below 0.5")
  }
}
