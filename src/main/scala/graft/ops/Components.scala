package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate pairs — the step
  * that turns pairwise matches (MinHash/SimHash/embedding) into dedup
  * *clusters* with one kept representative (SURVEY.md §2.3 "Dedup":
  * transitivity). GraphFrames-free: iterative min-label propagation on
  * DataFrames.
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; converges in O(diameter) rounds (dup clusters are tiny —
  * diameter is single digits in practice). Per-round lineage is cut with
  * localCheckpoint so the plan doesn't grow unboundedly — the standard
  * guard for iterative DataFrame algorithms (at cluster scale, use a
  * checkpoint dir on durable storage instead).
  */
object Components {

  /** pairs(a_id, b_id) → (id, component) for every id appearing in a pair;
    * component = min id reachable through the pair graph. */
  /** @throws java.lang.IllegalStateException when maxIter rounds did not converge —
    *   a silent partial result would under-deduplicate; clusters deeper
    *   than maxIter hops indicate either a pathological pair graph or a
    *   maxIter too small for the corpus. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("component"), lit(false).as("own"))
      // carry each node's previous label through the same aggregation
      // (`own` marks the labels-side row — exactly one per id), so change
      // detection is a scan of the checkpointed result, not an extra join
      val next = labels.select(col("id"), col("component"), lit(true).as("own"))
        .union(viaNeighbors)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"),
          max(when(col("own"), col("component"))).as("old"))
        .localCheckpoint(true)
      val changed = next.filter(col("component") =!= col("old")).count()
      labels = next.select(col("id"), col("component"))
      converged = changed == 0L
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "raise maxIter or inspect the pair graph for pathological chains")
    labels
  }

  /** Full near-dup dedup: keep one representative (min id) per component;
    * rows in no pair keep themselves. Returns the deduplicated df. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
