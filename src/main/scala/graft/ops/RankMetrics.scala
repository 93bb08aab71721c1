package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — the EVALUATION tier of the BM25 / ANN /
  * RAG retrieval stack (SURVEY.md §2.3 "similarity search"): given
  * ranked result lists and binary relevance labels, report per query
  *
  *   mrr         — 1 ∕ rank of the first relevant hit (0 if none),
  *   p_at_k      — relevant hits in the top k ∕ k,
  *   recall_at_k — relevant hits in the top k ∕ all relevant,
  *   ndcg_at_k   — DCG ∕ ideal DCG with the standard 1∕log₂(rank+1)
  *                 gain curve,
  *
  * the IR readout a retrieval pipeline regression-gates on.
  *
  * Determinism (the repo's oracle discipline): each rank's discount
  * term is ONE fixed-order double expression micro-quantized to an
  * integer — round(10⁶ ∕ (ln(rank+1) ∕ ln 2)) — so per-query DCG and
  * ideal-DCG are exact integer sums (order-independent), and every
  * ratio is a final fixed-order double over exact values. The ideal
  * DCG is computed from the relevant-count alone via a bounded
  * `sequence` fold (ranks 1..min(n_rel, k)), no second pass.
  *
  * Plan: one equi-join of the (q, doc, rank) lists (bounded: queries ×
  * k rows) against the labels, one labels-side count, one per-query
  * aggregate — nothing corpus-sized; at 100 TB the ranked lists are
  * already top-k by construction and labels are an eval set. */
object RankMetrics {

  private val ln2 = math.log(2.0)

  /** round(10⁶ / log₂(rank+1)) as a codegen-able column — the shared
    * discount term (also interpolated into the q175 oracle SQL). */
  private def discountMicro(rank: Column): Column =
    round(lit(1e6d) / (log(rank.cast("double") + lit(1.0d)) / lit(ln2)))
      .cast("long")

  /** @param ranked (qCol, docCol, rankCol) rows, rank 1-based within
    *   each query; rows beyond `k` are ignored.
    * @param labels (qCol, docCol) rows — the relevant pairs (binary).
    *   Queries with no labeled relevant doc report recall/ndcg = 0;
    *   labeled queries with NO ranked rows at all report an all-zero
    *   metrics row (never silently vanish from the readout). */
  def rankingMetrics(ranked: DataFrame, labels: DataFrame,
      qCol: String, docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val lab = labels.select(col(qCol), col(docCol)).distinct()
    val nRel = lab.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col(rankCol) <= k)
      .join(lab.withColumn("_rel", lit(1L)), Seq(qCol, docCol), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0L)))
    val perQ = hits.groupBy(col(qCol)).agg(
      sum(col("_rel")).as("_hits"),
      min(when(col("_rel") === 1L, col(rankCol))).as("_first"),
      sum(when(col("_rel") === 1L, discountMicro(col(rankCol)))
        .otherwise(lit(0L))).as("_dcg_micro"))
    perQ
      // FULL join: a query that has relevance labels but ZERO ranked rows
      // (retrieval returned nothing) must still emit a row — all-zero
      // metrics — or a consumer averaging per-query rows over-reports
      // quality exactly when the system fails hardest (r14 advice).
      .join(nRel, Seq(qCol), "full")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("_hits", coalesce(col("_hits"), lit(0L)))
      .withColumn("_dcg_micro", coalesce(col("_dcg_micro"), lit(0L)))
      // ideal DCG: the same micro terms at ranks 1..min(n_rel, k) —
      // derived from the count alone, identical fold in the oracle
      // sequence(1, 0) would run DESCENDING in Spark — guard n_rel = 0
      .withColumn("_idcg_micro", when(col("n_rel") > 0L, expr(
        s"aggregate(sequence(1, int(least(n_rel, ${k}L))), 0L, " +
          s"(a, i) -> a + cast(round(1e6d / (ln(cast(i as double) + 1.0d) / $ln2)) as long))"))
        .otherwise(lit(0L)))
      .select(
        col(qCol),
        col("n_rel"),
        round(when(col("_first").isNotNull,
            lit(1.0d) / col("_first").cast("double")).otherwise(lit(0.0d)), 6)
          .as("mrr"),
        round(col("_hits").cast("double") / lit(k.toDouble), 6).as("p_at_k"),
        round(when(col("n_rel") > 0L,
            col("_hits").cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0d)), 6).as("recall_at_k"),
        round(when(col("_idcg_micro") > 0L,
            col("_dcg_micro").cast("double") / col("_idcg_micro").cast("double"))
          .otherwise(lit(0.0d)), 6).as("ndcg_at_k"))
  }

  /** The discount constant used above, exposed for the oracle builder
    * so both engines interpolate the bit-identical ln 2. */
  private[graft] def ln2Const: Double = ln2
}
