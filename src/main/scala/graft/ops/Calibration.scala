package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier CALIBRATION audit — the reliability diagram + expected
  * calibration error (ECE) readout (Guo et al. 2017): before a curation
  * pipeline trusts "keep everything the quality model scores above
  * 0.8", it needs to know whether 0.8 MEANS 80% — i.e. whether the
  * model's confidence matches the empirical agreement rate against a
  * reference label, per confidence bin.
  *
  * Output: one row per non-empty equal-width confidence bin —
  * (bin, n_docs, mean_conf, frac_pos, gap) — plus the single ECE value
  * Σ n_b∕N · |mean_conf_b − frac_pos_b| carried on every row (the
  * ev_share convention).
  *
  * Determinism (the oracle discipline): confidences are micro-quantized
  * to exact integers (round(conf·10⁶)) BEFORE any aggregation, the bin
  * index is pure integer arithmetic ((cm·bins) div 10⁶, capped), each
  * bin's |conf − acc| gap is one fixed-order double over exact sums
  * micro-quantized back to an integer, and the ECE is an exact integer
  * Σ gap_micro·n with one final divide — bit-replayable in DuckDB.
  *
  * Plan: one equi-join of predictions and labels on id, one grouped
  * aggregate to ≤ `bins` rows, one 1-row total broadcast back. Nothing
  * after the join is more than bins-sized. The confidence-range
  * precondition is a typed limit-probe failure, not a silent wrong
  * binning. */
object Calibration {

  /** @param pred (idCol, confCol) — confidence in [0, 1] (enforced).
    * @param labels (idCol, labelCol) — reference label in {0, 1}.
    * @param bins equal-width confidence bins (conf = 1 lands in the
    *   last bin). */
  def reliability(pred: DataFrame, labels: DataFrame, idCol: String,
      confCol: String, labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000], got $bins")
    val joined = pred.select(col(idCol), col(confCol))
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
    val offRange = joined.filter(col(confCol) < 0.0d || col(confCol) > 1.0d ||
        (col(labelCol) =!= 0L && col(labelCol) =!= 1L))
      .limit(1).count()
    require(offRange == 0L,
      "calibration audit needs confidences in [0, 1] and labels in {0, 1} " +
        "— found out-of-range rows; fix the prediction/label columns first")
    val perBin = joined
      .withColumn("_cm", round(col(confCol).cast("double") * 1e6d).cast("long"))
      .withColumn("bin",
        least(expr(s"(_cm * $bins) div 1000000"), lit(bins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_cm")).as("_sc"),
        sum(col(labelCol).cast("long")).as("_sp"))
      .withColumn("mean_conf",
        round(col("_sc").cast("double") / (col("n_docs").cast("double") * 1e6d), 6))
      .withColumn("frac_pos",
        round(col("_sp").cast("double") / col("n_docs").cast("double"), 6))
      .withColumn("_gap_micro",
        round(abs(col("_sc").cast("double") / (col("n_docs").cast("double") * 1e6d) -
          col("_sp").cast("double") / col("n_docs").cast("double")) * 1e6d)
          .cast("long"))
    val tot = perBin.agg(
      sum(col("n_docs")).as("_n"),
      sum(col("_gap_micro") * col("n_docs")).as("_gsum"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_docs"), col("mean_conf"), col("frac_pos"),
        round(col("_gap_micro").cast("double") / 1e6d, 6).as("gap"),
        round(col("_gsum").cast("double") / (col("_n").cast("double") * 1e6d), 6)
          .as("ece"))
  }
}
