package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering with a hashed linear classifier — the
  * fastText shape (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification") that CCNet/GPT-3-style curation uses to keep
  * "Wikipedia-like" pages: features are the document's unigrams AND
  * adjacent-token bigrams, hashed into a fixed bucket space; the model is
  * ONE weight per bucket; the document score is the mean feature weight.
  *
  * Architecture (the production shape, not a UDF): the trained model IS a
  * table (bucket → weight). Scoring is feature explode → broadcast-hash
  * join against the weight table → one groupBy(doc) of (count, long-sum)
  * rows. At 100 TB nothing about this changes: the weight table is
  * O(buckets) (here 1024; a few million in production — still broadcast
  * range), the explode is map-side, and the only shuffle is the final
  * doc-keyed aggregation, map-side combined to two longs per doc.
  *
  * STUB boundary (same convention as [[Multimodal.decodeStub]]): this
  * container cannot train a real classifier, so [[weightTable]] derives
  * the weights from a fixed LCG over the bucket id — deterministic,
  * engine-replayable, and swappable for a parquet load of real trained
  * weights without touching the scoring plan.
  *
  * Determinism: weights are integer micro-units in [-1e6, 1e6]; the
  * per-doc sum is an exact BIGINT (order-independent in any engine) and
  * is floated exactly once at the end, so DuckDB replays the score
  * bit-for-bit. The keep decision compares the INTEGER sum, not the
  * rounded float.
  */
object QualityModel {

  /** Feature-hash bucket count (the fastText `-bucket` knob). */
  final val NumBuckets = 1024

  // LCG constants for the stand-in weights: w_micro(b) ∈ [-1e6, 1e6]
  final val WeightMul = 69069L
  final val WeightAdd = 12345L
  final val WeightMod = 2000001L // odd → exact center at WeightHalf
  final val WeightHalf = 1000000L

  /** The "trained model": one integer micro-weight per hash bucket.
    * Production swap-in: `spark.read.parquet(modelPath)` with the same
    * (bucket, w_micro) schema. */
  def weightTable(spark: SparkSession, k: Int = NumBuckets): DataFrame =
    spark.range(0, k).select(
      col("id").as("bucket"),
      (((col("id") * WeightMul + WeightAdd) % WeightMod) - WeightHalf)
        .as("w_micro"))

  /** One row per hashed feature bucket: unigrams + adjacent bigrams of
    * the normalized text, bucketed by the portable polynomial fold mod
    * `k`, via the one-pass codegen kernel
    * ([[graft.expr.DedupKernel.featureBuckets]] — a bigram is a
    * CONTIGUOUS byte range of the single-space-normalized text, so the
    * whole feature map is one scan). Map-only, and only 8-byte bucket
    * ids ever leave the scan — feature strings are never materialized. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = NumBuckets): DataFrame = {
    require(k >= 1, s"bucket count must be >= 1, got $k")
    df.select(col(idCol),
        graft.expr.DedupKernel.featureBucketsCol(Dedup.normText(col(textCol)), k)
          .as("_bs"))
      .select(col(idCol), explode(col("_bs")).as("bucket"))
  }

  /** Expression-only differential twin of [[hashedFeatures]] — explodes
    * the literal feature strings and hashes each with the portable
    * `aggregate` fold (the arithmetic the DuckDB oracle replays). Exists
    * to prove kernel ≡ pipeline in QualityModelSpec; the kernel path is
    * the one queries use. */
  def hashedFeaturesPortable(df: DataFrame, idCol: String, textCol: String,
      k: Int = NumBuckets): DataFrame = {
    require(k >= 1, s"bucket count must be >= 1, got $k")
    df.select(col(idCol), graft.ops.TextAnalysis.tokens(col(textCol)).as("_w"))
      .select(col(idCol), explode(concat(col("_w"), expr(
        "CASE WHEN size(_w) >= 2 THEN transform(sequence(1, size(_w) - 1), " +
          "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1))) " +
          "ELSE CAST(array() AS array<string>) END"))).as("feat"))
      .filter(length(col("feat")) > 0)
      .withColumn("bucket",
        pmod(Dedup.polyHashCol("feat", graft.expr.DedupKernel.B1), lit(k.toLong)))
  }

  /** Per-document classifier score + keep decision: score = Σ w_micro /
    * (n_features · 1e6) (mean feature weight, in [-1, 1]); keep = the
    * exact integer sum is positive. Documents with no features (empty
    * text) carry no score and are absent — the filter has nothing to
    * judge them on. */
  def classifierScore(df: DataFrame, idCol: String, textCol: String,
      k: Int = NumBuckets): DataFrame = {
    val weights = weightTable(df.sparkSession, k)
    hashedFeatures(df, idCol, textCol, k)
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum(col("w_micro")).as("_sm"))
      .withColumn("score",
        round(col("_sm").cast("double") /
          (col("n_features").cast("double") * 1e6d), 6))
      .withColumn("keep",
        when(col("_sm") > 0L, 1L).otherwise(0L))
      .select(col(idCol), col("n_features"), col("score"), col("keep"))
  }
}
