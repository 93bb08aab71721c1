package graft.ops

import graft.expr.VectorExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension).
  *
  * Two tiers, per the build brief:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline,
  *    a broadcast cross join + per-group top-k window. O(|Q|·N) but fully
  *    distributed and codegen'd; right for small query batches.
  *  - [[lshBucketTopK]]: the scale path — sign-random-projection (SRP)
  *    bucketing: 'planes' deterministic hyperplanes hash every vector to a
  *    b-bit bucket; candidates are vectors sharing the query's bucket (or
  *    any bucket within Hamming distance 1 when 'multiProbe'), so the
  *    pairwise work drops from N to N / 2^b per query on average. Exact
  *    cosine re-ranks the candidates. Build is one pass (batch index
  *    build, not online serving — BASELINE.json north star).
  */
object Similarity {

  /** Exact cosine top-k of `candidates` for every row of `queries`.
    * Schemas: queries (q_id, qv: array<float>), candidates (n_id,
    * nv: array<float>). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    candidates.crossJoin(broadcast(queries))
      .withColumn("sim", VectorExprs.cosine(col("nv"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rnk"))
  }

  /** Margin-based k-NN scoring (Artetxe & Schwenk 2019 — the CCMatrix /
    * LASER bitext-mining criterion): margin(x, y) =
    * 2·cos(x,y) / (avg_{kQ} cos(x,·) + avg_{kN} cos(·,y)) — raw cosine
    * normalized by each side's top-k neighborhood mean, which suppresses
    * hub vectors that score high against EVERYTHING.
    *
    * Schemas: queries (q_id, qv), candidates (n_id, nv). Determinism:
    * cosines quantize to integer micro-units first, the top-k sums are
    * exact long sums over fixed k, the margin is one float expression
    * from integers. Scale: one broadcast cross join feeds all three
    * uses; both rank filters plan as WindowGroupLimit (per-partition
    * heap prune before the exchange); the final join is broadcast
    * (query-side aggregate) + equi on n_id. */
  def marginKnn(queries: DataFrame, candidates: DataFrame,
      kQ: Int = 8, kN: Int = 4): DataFrame = {
    require(kQ >= 1 && kN >= 1, s"neighborhood sizes must be >= 1: $kQ, $kN")
    val sims = candidates.crossJoin(broadcast(queries))
      .select(col("q_id"), col("n_id"),
        round(VectorExprs.cosine(col("nv"), col("qv")) * 1e6d).cast("long")
          .as("sim_micro"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_micro").desc, col("n_id"))
    val xk = sims.withColumn("r", row_number().over(wq)).filter(col("r") <= kQ)
      .groupBy(col("q_id")).agg(sum(col("sim_micro")).as("xs"))
    val wn = Window.partitionBy(col("n_id"))
      .orderBy(col("sim_micro").desc, col("q_id"))
    val yk = sims.withColumn("r", row_number().over(wn)).filter(col("r") <= kN)
      .groupBy(col("n_id")).agg(sum(col("sim_micro")).as("ys"))
    sims.join(broadcast(xk), "q_id").join(yk, "n_id")
      .select(col("q_id"), col("n_id"),
        (col("sim_micro").cast("double") / 1e6d).as("cos_sim"),
        round(col("sim_micro").cast("double") * 2.0d /
          (col("xs").cast("double") / kQ.toDouble +
            col("ys").cast("double") / kN.toDouble), 6).as("margin"))
  }

  /** Deterministic SRP hyperplanes as small integers in [-1000, 1000]
    * (splitmix64 of (seed, plane, dim)). Integer weights — together with
    * [[microQuantized]] vectors — make every bucket bit an exact integer
    * comparison, identical on any engine: no float-summation-order
    * dependence at a bucket boundary. Recall is unaffected (a random
    * integer direction is as good as a random float one). */
  private[graft] def planesInt(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Long]] =
    Array.tabulate(numPlanes, dim) { (p, d) =>
      var x = seed + p.toLong * 7919L + d.toLong * 104729L + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      java.lang.Math.floorMod(x ^ (x >>> 31), 2001L) - 1000L
    }

  /** Add an SRP `bucket` column (b-bit integer) to a vector DataFrame,
    * for one hash table (`seed` selects the table's plane set). Bit i =
    * sign of the integer dot product ⟨round(v·10⁶), plane_i⟩, computed by
    * the codegen [[graft.expr.SrpBuckets]] kernel. */
  def withBucket(df: DataFrame, vecCol: String, numPlanes: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame =
    df.withColumn("bucket",
      element_at(VectorExprs.srpBuckets(col(vecCol), numPlanes, dim, 1, seed), 1))

  /** Multi-table SRP index rows: one (table, bucket) per input row per
    * hash table — the standard L-tables LSH layout. Candidate storage is
    * ×L (an index, built in batch); recall compounds as 1-(1-p)^L.
    * Single-pass: ONE scan, one codegen kernel call computing all L codes
    * (quantize once, L×b integer dots in a generated loop), then a
    * posexplode — not L unioned re-scans of the source. */
  def withBuckets(df: DataFrame, vecCol: String, numPlanes: Int,
      dim: Int, numTables: Int, seed: Long = 42L): DataFrame =
    // Null vectors are EXCLUDED from the index, explicitly: a null
    // embedding has no meaningful bucket (the pre-r3 union form silently
    // hashed it to table-0/bucket-0, polluting that bucket's candidates),
    // and posexplode of the kernel's null output would drop the row
    // anyway — the filter makes that contract visible.
    df.filter(col(vecCol).isNotNull)
      .select(col("*"), posexplode(
        VectorExprs.srpBuckets(col(vecCol), numPlanes, dim, numTables, seed))
      .as(Seq("table", "bucket")))

  /** Approximate top-k: candidates restricted to the query's SRP bucket in
    * any of `numTables` independent hash tables (plus all Hamming-
    * distance-1 buckets per table when multiProbe), re-ranked by exact
    * cosine. The join is an equi-join on (table, bucket) — shuffle-
    * partitioned, never a cross join. */
  def lshBucketTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      numPlanes: Int = 12, dim: Int = 64, numTables: Int = 4,
      multiProbe: Boolean = true): DataFrame = {
    val cb = withBuckets(candidates, "nv", numPlanes, dim, numTables)
    val qb0 = withBuckets(queries, "qv", numPlanes, dim, numTables)
    val qb =
      if (!multiProbe) qb0
      else qb0.withColumn("bucket", explode(expr(
        s"array_union(array(bucket), transform(sequence(0, ${numPlanes - 1}), " +
          "i -> cast(bucket as bigint) ^ shiftleft(1L, i)))")))
    // rank on the 6-dp-rounded cosine (ties → n_id): float-sum order at
    // full precision is engine- and partitioning-dependent, so the rounded
    // key is what makes the top-k cross-engine reproducible (oracle q35)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(round(col("sim"), 6).desc, col("n_id"))
    cb.join(qb, Seq("table", "bucket"))
      .select(col("q_id"), col("n_id"), col("nv"), col("qv"))
      .distinct()
      .withColumn("sim", VectorExprs.cosine(col("nv"), col("qv")))
      .select(col("q_id"), col("n_id"), col("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Exact all-pairs cosine ≥ threshold (the embedding near-dup check).
    * O(N²) by construction — the small-slice verifier for
    * [[bucketedNearDupPairs]], which is the scale path. */
  def nearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = embeddings.select(col(idCol).as("b_id"), col(vecCol).as("bv"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", VectorExprs.cosine(col("av"), col("bv")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
  }

  /** Embedding near-duplicate pairs at scale: SRP-LSH candidate
    * generation + exact cosine verification *within buckets only*.
    *
    * Plan shape: map-only bucketing (one (table, bucket) row per vector
    * per hash table) → self-equi-join on (table, bucket) → distinct
    * pairs → codegen cosine ≥ threshold. Never a cartesian: pairwise
    * work is Σ_buckets |bucket|² ≈ N²·L/2^b instead of N² — tune
    * `numPlanes` so buckets stay in the thousands of rows as N grows
    * (b ≈ log₂(N/target) keeps per-bucket blocks constant-size at
    * 100 TB). Recall is approximate by construction (a pair missing
    * from every table's bucket is not emitted): a pair at angle θ
    * collides per table with p = (1-θ/π)^numPlanes and is found with
    * 1-(1-p)^numTables — AND over planes, OR over tables, exactly the
    * MinHash banding law — so recall→1 for true near-dups (θ→0) and
    * drops deliberately for distant pairs; raise numTables (recall) or
    * numPlanes (pruning) per corpus. The exact verifier [[nearDupPairs]]
    * bounds realized recall on slices. Deterministic + engine-portable:
    * integer SRP planes and micro-quantized bucket bits (see
    * [[withBucket]]), so an external oracle re-derives the very same
    * candidate set. */
  def bucketedNearDupPairs(embeddings: DataFrame, idCol: String,
      vecCol: String, threshold: Double, numPlanes: Int = 5,
      dim: Int = 64, numTables: Int = 10, seed: Long = 42L): DataFrame = {
    val base = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    // Shuffle is bounded by the INDEX (N·numTables wide rows into the
    // bucket equi-join), never by the candidate pairs: cosine + threshold
    // run map-side inside the join stage, so only surviving pairs (a tiny
    // fraction when threshold targets near-dups) reach the cross-table
    // distinct. cos_sim is bitwise-identical across a pair's duplicate
    // bucket hits (same codegen over the same vectors), so distinct on
    // (a_id, b_id, cos_sim) is distinct-by-pair.
    val bk = withBuckets(base, "v", numPlanes, dim, numTables, seed)
    val left = bk.select(col("table"), col("bucket"),
      col("id").as("a_id"), col("v").as("av"))
    val right = bk.select(col("table"), col("bucket"),
      col("id").as("b_id"), col("v").as("bv"))
    left.join(right, Seq("table", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", VectorExprs.cosine(col("av"), col("bv")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
      .distinct()
  }

  /** k-center greedy coreset selection (Gonzalez 1985; the diversity
    * selector of active-learning/core-set curation, Sener & Savarese
    * 2018): seed with the smallest id, then k−1 times add the point
    * FARTHEST from the selected set (max over candidates of min L2 to
    * the selection). Returns (sel_order, id, radius) — radius is the
    * selection-time min-distance, the 2-approximation coverage radius
    * sequence (non-increasing).
    *
    * Determinism: distances are the codegen [[VectorExprs.l2]] kernel,
    * 6-dp-rounded BEFORE the argmax (the engine-stable comparison the
    * vector queries use throughout), ties by ascending id.
    *
    * Scale: each of the k rounds is ONE map-only scan (selected vectors
    * are literal/broadcast-sized) into a TakeOrderedAndProject of a
    * single row — the driver holds k (id, vector) pairs, never data.
    * k full scans is the textbook distributed k-center; for large k,
    * switch the inner metric to distances-to-cells (IVF) — same loop. */
  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    * from a retrieved candidate set, greedily keep k results maximizing
    * λ·relevance − μ·max-cosine-to-already-selected — the serving-side
    * diversifier that stops near-duplicate hits crowding a result page.
    *
    * The candidate frame is RETRIEVAL-DEPTH-sized by construction (the
    * top-N of a ranker), so collecting it to the driver is bounded by a
    * config constant, never by data — the same driver-assembly contract
    * as [[graft.ops.ExactRank]]. That contract is ENFORCED, not just
    * documented: the collect is capped at `maxCandidates` rows (via a
    * limit-probe, no extra count job) and a miswired caller that feeds
    * a corpus-sized frame fails with a typed error instead of OOMing
    * the driver — the [[graft.ops.Decontaminate]] ceiling discipline.
    * All comparisons use 6-dp-rounded
    * cosines and scores (ties by ascending id), so the greedy trajectory
    * replays identically in any engine.
    *
    * `candidates`: (idCol, vecCol, relCol) with relCol the 6-dp-rounded
    * relevance. Returns (rank, idCol, relCol, mmr). */
  def mmrRerank(candidates: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lambda: Double = 0.7, mu: Double = 0.3,
      maxCandidates: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(maxCandidates >= k,
      s"maxCandidates ($maxCandidates) must be >= k ($k)")
    val spark = candidates.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dp += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dp / (math.sqrt(na) * math.sqrt(nb))
    }
    // limit-probe: never ship more than maxCandidates + 1 rows to the
    // driver; one extra row is enough to prove the contract is broken
    val cands = candidates.select(col(idCol), col(vecCol), col(relCol))
      .limit(maxCandidates + 1)
      .as[(Long, Array[Float], Double)].collect()
    require(cands.length <= maxCandidates,
      s"mmrRerank candidate frame exceeds maxCandidates = $maxCandidates " +
        "rows — it must be a retrieval-depth top-N, not a corpus; raise " +
        "maxCandidates only if the driver can genuinely hold the frame")
    require(cands.nonEmpty, "empty candidate set")
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.SortedSet(cands.indices: _*)(
      Ordering.by(i => cands(i)._1))
    while (selected.size < math.min(k, cands.length)) {
      var bestI = -1; var bestScore = Double.NegativeInfinity
      remaining.foreach { ci =>
        val c = cands(ci)
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(si => r6(cos(c._2, cands(si)._2))).max
        val score = r6(lambda * c._3 - mu * maxSim)
        // strict > keeps the smallest id on ties (remaining is id-sorted)
        if (score > bestScore) { bestScore = score; bestI = ci }
      }
      selected += bestI; remaining -= bestI
      out += ((cands(bestI)._1, cands(bestI)._3, bestScore))
    }
    out.toSeq.zipWithIndex
      .map { case ((id, rel, mmr), i) => (i + 1L, id, rel, mmr) }
      .toDF("rnk", idCol, relCol, "mmr")
  }

  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val seed = df.orderBy(col(idCol)).select(col(idCol), col(vecCol))
      .as[(Long, Array[Float])].head()
    var sel = Vector(seed)
    val out = scala.collection.mutable.ArrayBuffer((seed._1, 0.0))
    while (sel.size < k) {
      val minD = sel.map(s => VectorExprs.l2(col(vecCol), typedLit(s._2)))
        .reduce((a, b) => least(a, b))
      val cand = df.filter(!col(idCol).isin(sel.map(_._1): _*))
        .select(col(idCol), round(minD, 6).as("d6"), col(vecCol))
        .orderBy(col("d6").desc, col(idCol))
        .limit(1)
        .as[(Long, Double, Array[Float])].head()
      sel = sel :+ ((cand._1, cand._3))
      out += ((cand._1, cand._2))
    }
    out.toSeq.zipWithIndex
      .map { case ((id, r), i) => (i + 1L, id, r) }
      .toDF("sel_order", idCol, "radius")
  }
}
