package graft.ops

import graft.SparkSpecBase

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("chains collapse transitively to the min id") {
    // components: {1,2,3,4} via chain, {10,11}, singleton edges none
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star and cycle shapes converge") {
    val pairs = Seq((5L, 1L), (5L, 2L), (5L, 3L), // star centered at 5
      (20L, 21L), (21L, 22L), (22L, 20L))          // cycle
      .toDF("a_id", "b_id")
    val got = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(5L) == 1L && got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L)
  }

  test("deep path graph (depth 120) converges well within maxIter via pointer doubling") {
    // a 121-node chain: diameter 120 > the old per-round propagation
    // budget; pointer doubling must close it in ~log2(120) rounds
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Components.connectedComponents(pairs, maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 121)
    assert(got.values.forall(_ == 0L), "every chain node must fold to min id 0")
  }

  test("durable checkpointDir variant produces identical components") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a_id", "b_id")
    val local = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val durable = Components.connectedComponents(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(local == durable)
    assert(new java.io.File(dir).listFiles().nonEmpty,
      "reliable checkpoints must be written to the durable dir")
  }

  test("bestPerCluster keeps the highest-priority row, min id on ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 99L), (3L, 99L), // cluster {1,2,3}: 2 and 3 tie -> 2
      (4L, 5L), (5L, 7L),              // cluster {4,5}: 5 wins
      (9L, 1L))                        // unclustered: absent from output
    .toDF("id", "prio")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a_id", "b_id")
    val got = Components.bestPerCluster(docs, "id", pairs, "prio")
      .orderBy("component")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 99L), (4L, 2L, 5L, 7L)))
  }

  test("dropNearDuplicates keeps one representative per cluster") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val kept = Components.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L)) // 2,3 fold into 1; 6 into 5; 4 untouched
  }

  test("end-to-end: minhash candidates -> components -> dedup") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
      (2L, "the quick brown fox jumps over the lazy dog today"),   // near dup
      (3L, "completely different text about spark and parquet files"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidates(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id")
    val kept = Components.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(3L))
    assert(kept.contains(0L))
    assert(!kept.contains(1L)) // exact dup folded
  }

  test("pageRankInt: hub of a star outranks leaves; pure-integer determinism") {
    // star: 1—2, 1—3, 1—4, plus an isolated pair 10—11
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    def run(parts: Int) = Components.pageRankInt(pairs.repartition(parts), 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pr = run(1)
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L))
    assert(pr(1L)._2 == 3L && pr(2L)._2 == 1L, "degrees")
    assert(pr(1L)._1 > pr(2L)._1, "hub outranks leaves")
    assert(pr(2L)._1 == pr(3L)._1 && pr(3L)._1 == pr(4L)._1, "leaves tie")
    assert(pr(10L)._1 == pr(11L)._1, "symmetric pair ties")
    // integer arithmetic → bit-identical under any partitioning
    assert(run(7) == pr, "partitioning changed integer ranks")
    // mass conservation up to the documented floor-div leak
    val total = pr.values.map(_._1).sum
    assert(total <= 1000000000000L && total > 990000000000L, s"mass $total")
  }

  test("pageRankInt: empty edge list yields an empty frame, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val out = Components.pageRankInt(empty, 3)
    assert(out.columns.toSeq == Seq("id", "pr_micro", "deg"))
    assert(out.count() == 0L)
  }

  test("appendToComponents: a bridge edge merges two old clusters; untouched labels pass through") {
    // old graph: chain {1,2,3}, pair {10,11}, bystander {50,51},
    // singleton {7} (self-loop only)
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 51L), (7L, 7L))
      .toDF("a_id", "b_id")
    val oldLabels = Components.connectedComponents(oldPairs)
    // batch: a bridge 3—10 merging two old clusters, plus a brand-new
    // cluster {20,21}, plus an edge hanging a new node off the singleton
    val newPairs = Seq((3L, 10L), (20L, 21L), (7L, 8L)).toDF("a_id", "b_id")
    val got = Components.appendToComponents(oldLabels, newPairs)
      .as[(Long, Long)].collect().toSeq.sorted
    val full = Components.connectedComponents(
        oldPairs.unionByName(newPairs))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == full, s"append diverged from full recompute:\n$got\nvs\n$full")
    val byId = got.toMap
    assert(Seq(10L, 11L).forall(byId(_) == 1L), s"bridge must merge to min id 1: $got")
    assert(byId(51L) == 50L && byId(8L) == 7L && byId(21L) == 20L)
  }

  test("appendToComponents rejects labelings whose labels are not member ids") {
    // labels must satisfy the min-id contract (label row (c, c) exists);
    // an external canonical id would enter the re-solve as a phantom node
    val badLabels = Seq((5L, 99L), (6L, 99L)).toDF("id", "component")
    val e = intercept[IllegalArgumentException](
      Components.appendToComponents(badLabels,
        Seq((5L, 7L)).toDF("a_id", "b_id")))
    assert(e.getMessage.contains("member ids"), e.getMessage)
  }

  test("appendToComponents with an empty batch returns the old labeling") {
    val oldPairs = Seq((1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    val oldLabels = Components.connectedComponents(oldPairs)
    val got = Components.appendToComponents(oldLabels,
        Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == oldLabels.as[(Long, Long)].collect().toSeq.sorted)
  }

  test("triangleCensus: hand-checked triangle + pendant graph") {
    // triangle 1-2-3 plus pendant 3-4: Δ=1; degrees 2,2,3,1 →
    // wedges 1+1+3+0 = 5; clustering 3·1/5 = 0.6
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val got = Components.triangleCensus(pairs)
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((4L, 5L, 1L, 0.6)), s"$got")
  }

  test("triangleCensus is orientation- and duplicate-insensitive") {
    val messy = Seq((2L, 1L), (3L, 2L), (1L, 3L), (3L, 4L), (4L, 3L), (1L, 2L))
      .toDF("a_id", "b_id")
    val got = Components.triangleCensus(messy)
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((4L, 5L, 1L, 0.6)), s"$got")
    // two disjoint triangles: Δ=2, wedges 6, coeff 1.0
    val two = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a_id", "b_id")
    val g2 = Components.triangleCensus(two).as[(Long, Long, Long, Double)].head()
    assert(g2 == ((6L, 6L, 2L, 1.0)), s"$g2")
  }

  test("clusterWeights: each cluster's mass sums to 1, singletons weigh 1") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // {1,2,3} one cluster, {4,5} another, 6 singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a_id", "b_id")
    val got = Components.clusterWeights(docs, "id", pairs)
      .orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 0.333333d), (2L, 1L, 3L, 0.333333d),
      (3L, 1L, 3L, 0.333333d),
      (4L, 4L, 2L, 0.5d), (5L, 4L, 2L, 0.5d),
      (6L, 6L, 1L, 1.0d)), got.toString)
    // effective corpus mass = number of clusters (up to the 6-dp rounds)
    val mass = got.map(_._4).sum
    assert(math.abs(mass - 3.0d) < 1e-5, s"mass $mass")
    // partition-layout independence
    val rep = Components.clusterWeights(docs.repartition(5), "id",
        pairs.repartition(3))
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rep == got)
  }

  test("degreeAssortativity: star = -1, regular cycle = 0, dup edges collapse") {
    import org.apache.spark.sql.functions.col
    // star 1-{2,3,4}: hub deg 3 vs leaves deg 1 -> perfectly
    // disassortative, r = -1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    val s = Components.degreeAssortativity(star)
      .as[(Long, Long, Double)].head()
    assert(s == ((4L, 3L, -1.0d)), s.toString)
    // 4-cycle: every node deg 2 -> zero degree variance, documented 0.0
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a_id", "b_id")
    val c = Components.degreeAssortativity(cyc)
      .as[(Long, Long, Double)].head()
    assert(c == ((4L, 4L, 0.0d)), c.toString)
    // duplicate/reversed pairs and self-loops collapse before counting
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L),
      (1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    val n = Components.degreeAssortativity(noisy)
      .as[(Long, Long, Double)].head()
    assert(n == ((4L, 3L, -1.0d)), n.toString)
    // partition invariance
    val rep = Components.degreeAssortativity(star.repartition(3))
      .as[(Long, Long, Double)].head()
    assert(rep == s)
    // a dumbbell (two hubs joined, each carrying leaves) is still
    // hub-leaf dominated: 4 of 5 edges touch a leaf -> r < 0
    val mixed = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (2L, 6L))
      .toDF("a_id", "b_id")
    val m = Components.degreeAssortativity(mixed)
      .select(col("assortativity")).as[Double].head()
    assert(m < 0.0d, s"hub-leaf dominated graph must be disassortative: $m")
  }

  test("kCore: triangle survives the 2-core, attached chain peels away") {
    // triangle {1,2,3} with a pendant chain 3-4-5-6: peeling eats the
    // chain from the far end (3 rounds — each round exposes the next),
    // the triangle keeps every member at deg 2
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a_id", "b_id")
    val got = Components.kCore(pairs, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: pure path empties at k=2; k=1 keeps everything") {
    val path = (0L until 6L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    assert(Components.kCore(path, k = 2).isEmpty)
    val k1 = Components.kCore(path, k = 1).as[(Long, Long)].collect().toMap
    assert(k1.size == 7 && k1(0L) == 1L && k1(3L) == 2L)
  }

  test("kCore: cascading collapse — 4-clique minus an edge has no 3-core") {
    // degrees a:2 b:2 c:3 d:3 -> peel a,b -> c-d alone -> peel -> empty;
    // the full 4-clique keeps all four at deg 3
    val full = Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)).toDF("a_id", "b_id")
    val k3 = Components.kCore(full, k = 3).as[(Long, Long)].collect().toMap
    assert(k3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val chipped = full.filter(!($"a_id" === 1L && $"b_id" === 2L))
    assert(Components.kCore(chipped, k = 3).isEmpty)
  }

  test("kCore: orientation/duplicate-insensitive; non-convergence throws typed") {
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("a_id", "b_id")
    val got = Components.kCore(dup, k = 2).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a 10-node path needs ~5 peel rounds; 2 must throw, not under-peel
    val path = (0L until 10L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    intercept[IllegalStateException](
      Components.kCore(path, k = 2, maxRounds = 2))
    intercept[IllegalArgumentException](Components.kCore(dup, k = 0))
  }

  test("modularity matches the hand-traced two-community case") {
    // edges (1,2),(3,4),(1,3); x={1,2}, y={3,4}: m=3, d_x=d_y=3,
    // e_x=e_y=1 → each term = (4·3·1 − 9)/36 = 1/12 = 0.083333
    val nodes = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"), (5L, "z"))
      .toDF("id", "c")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("a_id", "b_id")
    val got = Components.modularity(nodes, "id", "c", pairs)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("x", 2L, 3L, 1L, 0.083333d, 0.166666d),
      ("y", 2L, 3L, 1L, 0.083333d, 0.166666d),
      ("z", 1L, 0L, 0L, 0.0d, 0.166666d)), got.toString)
  }

  test("modularity: perfect split and anti-community; typed guards") {
    val nodes = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y")).toDF("id", "c")
    // all edges intra: Q = 1 − Σ(d_c/2m)² = 1 − 2·(1/2)² = 0.5
    val intra = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    assert(Components.modularity(nodes, "id", "c", intra)
      .select("q_total").as[Double].head() == 0.5d)
    // all edges cross: e_c = 0, Q = −Σ(d_c/2m)² = −0.5
    val cross = Seq((1L, 3L), (2L, 4L)).toDF("a_id", "b_id")
    assert(Components.modularity(nodes, "id", "c", cross)
      .select("q_total").as[Double].head() == -0.5d)
    // duplicate/reversed/self edges collapse canonically
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (3L, 4L))
      .toDF("a_id", "b_id")
    assert(Components.modularity(nodes, "id", "c", noisy)
      .select("q_total").as[Double].head() == 0.5d)
    intercept[IllegalArgumentException](Components.modularity(
      nodes, "id", "c", intra.limit(0)))
    intercept[IllegalArgumentException](Components.modularity(
      nodes.limit(2), "id", "c", cross)) // unlabeled endpoints
    intercept[IllegalArgumentException](Components.modularity(
      Seq((Option.empty[Long], "x")).toDF("id", "c"), "id", "c", intra))
  }

  test("hitsBipartite: symmetric complete graph is uniform; star ranks hub first") {
    // complete 2×2: perfect symmetry — every hub and every authority
    // holds exactly half the integer mass at every step
    val complete = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("u", "i")
    val c = Components.hitsBipartite(complete, "u", "i")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(c.forall(_._3 == 500000000L), c.toString)
    assert(c.map(_._4).forall(_ == 2L), c.toString)
    // u1 touches both items, u2 only i10: u1 outranks u2; i10 outranks i11
    val star = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "i")
    val s = Components.hitsBipartite(star, "u", "i")
      .as[(String, Long, Long, Long)].collect().toSeq
    val hubs = s.filter(_._1 == "hub")
    val auths = s.filter(_._1 == "auth")
    assert(hubs.head._2 == 1L && hubs(1)._2 == 2L, s.toString)
    assert(auths.head._2 == 10L && auths(1)._2 == 11L, s.toString)
    // the integer mass is conserved up to floor slack (< #nodes)
    assert(hubs.map(_._3).sum > 1000000000L - 2 &&
      hubs.map(_._3).sum <= 1000000000L, s.toString)
    // determinism: pure function of the edge set
    val again = Components.hitsBipartite(star, "u", "i")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(s == again)
  }

  test("hitsBipartite: duplicate edges collapse; empty and NULL guards") {
    val dup = Seq((1L, 10L), (1L, 10L), (2L, 11L)).toDF("u", "i")
    val clean = Seq((1L, 10L), (2L, 11L)).toDF("u", "i")
    assert(Components.hitsBipartite(dup, "u", "i")
        .as[(String, Long, Long, Long)].collect().toSeq ==
      Components.hitsBipartite(clean, "u", "i")
        .as[(String, Long, Long, Long)].collect().toSeq)
    assert(Components.hitsBipartite(clean.limit(0), "u", "i").isEmpty)
    intercept[IllegalArgumentException](Components.hitsBipartite(
      Seq((Option.empty[Long], 10L)).toDF("u", "i"), "u", "i"))
    intercept[IllegalArgumentException](Components.hitsBipartite(
      clean, "u", "i", iters = 0))
  }
}
