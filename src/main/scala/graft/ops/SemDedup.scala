package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.VectorExprs

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  * cluster the embedding space with k-means, then prune near-duplicate
  * vectors WITHIN each cluster only — the pairwise cosine never crosses
  * cluster boundaries, so the quadratic term is bounded by the largest
  * cell, not the corpus.
  *
  * The reference has no dedup at all (its nearest query is exact 1-NN,
  * embeddings.rs:402-411); this is north-star pipeline surface. Training
  * reuses [[Ivf.train]]'s deterministic, engine-portable k-means (md5
  * init, integer micro-sums), so an external engine can replay the cells
  * and the prune decisions bit-for-bit — the q94 oracle does exactly that.
  *
  * Scale (100 TB): one k-means train (driver state = nc×dim longs), one
  * map-only cell assignment, one self-equi-join ON THE CELL KEY. Prune
  * policy is deterministic and relational: a vector is pruned iff ANY
  * earlier (smaller-id) vector in the same cell has cosine ≥ τ —
  * deliberately a TRANSITIVE OVER-PRUNING RELAXATION of the paper's
  * sequential greedy scan, not a reproduction of it: in a chain a~b, b~c,
  * a≁c the paper's keep-first sweep keeps c (its only ≥τ neighbor b was
  * itself pruned), while this join prunes c because the trigger need not
  * have survived. The relaxation is what makes the policy order-free and
  * join-shaped (parallelizes with no ordered sweep); it only ever prunes
  * MORE, never keeps a duplicate the paper would drop. nc should grow
  * ~linearly with corpus size to keep per-cell pair counts bounded.
  */
object SemDedup {

  /** Rows PRUNED by within-cell semantic dedup: (vec_id, cell,
    * trigger_id, max_sim), where trigger_id is the smallest triggering
    * earlier neighbor — which may itself have been pruned (see the
    * relaxation note above) — and max_sim the highest 6-dp-rounded cosine
    * to any earlier same-cell neighbor at or above `threshold`. The
    * raw-cosine prefilter sits 1e-6 below τ so float noise can't clip the
    * rounded boundary (q34 pattern). */
  def prunedWithinCells(df: DataFrame, idCol: String, vecCol: String,
      nc: Int = 16, iters: Int = 2, threshold: Double = 0.4,
      seed: Long = 42L,
      trained: Option[Ivf.IvfModel] = None): DataFrame = {
    // pass `trained` to reuse a build-once quantizer (training is
    // deterministic, so a cached model ≡ a fresh one bit-for-bit)
    val model = trained.getOrElse(Ivf.train(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "id", "v",
      nc, iters, seed))
    val cells = Ivf.assign(df, vecCol, model)
      .select(col(idCol), col(vecCol), col("ivf_cell").cast("long").as("cell"))
    val a = cells.select(col(idCol).as("a_id"), col(vecCol).as("_av"), col("cell"))
    val b = cells.select(col(idCol).as("b_id"), col(vecCol).as("_bv"), col("cell"))
    a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("_raw", VectorExprs.cosine(col("_av"), col("_bv")))
      .filter(col("_raw") >= threshold - 1e-6)
      .withColumn("sim", round(col("_raw"), 6))
      .filter(col("sim") >= threshold)
      .groupBy(col("b_id").as("vec_id"), col("cell"))
      .agg(min(col("a_id")).as("trigger_id"), max(col("sim")).as("max_sim"))
  }
}
