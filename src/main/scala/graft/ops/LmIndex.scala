package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted stupid-backoff LM model — the q122/q123
  * build-once/probe-many contract applied to the LM family: the
  * trigram/bigram/unigram count tables from
  * [[TextAnalysis.trigramModel]] are written as parquet once (the
  * "train" job) and any number of incoming batches are scored against
  * them ([[TextAnalysis.scoreBackoffTrigrams]]) without ever touching
  * the training corpus again — the LM twin of the persisted BM25
  * postings ([[TextIndex]]) and IVF cells ([[Ivf]]).
  *
  * Layout: `<dir>/tri`, `<dir>/bi`, `<dir>/uni` parquet tables with the
  * [[TextAnalysis.trigramModel]] schemas. At 100 TB, bucket `tri` by a
  * hash of (w1, w2, w3) and `bi`/`uni` by their keys so the probe
  * joins can co-locate; counts are vocabulary-sized either way. */
object LmIndex {

  /** Train: write the three count tables. One scan of the training
    * text per n-gram order, all map-side combined. */
  def build(train: DataFrame, textCol: String, dir: String): Unit = {
    val (tri, bi, uni) = TextAnalysis.trigramModel(train, textCol)
    tri.write.mode("overwrite").parquet(s"$dir/tri")
    bi.write.mode("overwrite").parquet(s"$dir/bi")
    uni.write.mode("overwrite").parquet(s"$dir/uni")
  }

  /** Incrementally extend the model with a new training batch: n-gram
    * counts are ADDITIVE, so the batch's own count tables are simply
    * appended as more parquet parts — no read, no merge job, no model
    * rebuild; [[score]] re-aggregates per key at read time (one
    * vocabulary-sized combiner groupBy). Append ≡ one-shot build over
    * the union is proven in spec and by the q170 oracle hash match. */
  def append(batch: DataFrame, textCol: String, dir: String): Unit = {
    val (tri, bi, uni) = TextAnalysis.trigramModel(batch, textCol)
    tri.write.mode("append").parquet(s"$dir/tri")
    bi.write.mode("append").parquet(s"$dir/bi")
    uni.write.mode("append").parquet(s"$dir/uni")
  }

  /** Serve: score a batch against the persisted model. Count parts
    * from [[build]] + any number of [[append]]s are re-aggregated per
    * key (vocab-sized, map-side combined) before the scoring joins.
    * Identical results to [[TextAnalysis.stupidBackoffTrigram]] with
    * the same training set — proven in spec and by the q168/q170
    * oracles (which replay the LIVE computation). */
  def score(s: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String,
      alpha: Double = 0.4, hotK: Int = 4096): DataFrame = {
    import org.apache.spark.sql.functions._
    TextAnalysis.scoreBackoffTrigrams(
      TextAnalysis.docTrigrams(batch, idCol, textCol).localCheckpoint(true),
      idCol,
      s.read.parquet(s"$dir/tri").groupBy(col("w1"), col("w2"), col("w3"))
        .agg(sum(col("c123")).as("c123")),
      s.read.parquet(s"$dir/bi").groupBy(col("wa"), col("wb"))
        .agg(sum(col("cab")).as("cab")),
      s.read.parquet(s"$dir/uni").groupBy(col("w"))
        .agg(sum(col("c")).as("c")),
      alpha, hotK)
  }
}
