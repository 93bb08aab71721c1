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

  /** Serve: score a batch against the persisted model. Identical
    * results to [[TextAnalysis.stupidBackoffTrigram]] with the same
    * train split — proven in spec and by the q168 oracle (which
    * replays the LIVE computation). */
  def score(s: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String,
      alpha: Double = 0.4, hotK: Int = 4096): DataFrame =
    TextAnalysis.scoreBackoffTrigrams(
      TextAnalysis.docTrigrams(batch, idCol, textCol).localCheckpoint(true),
      idCol,
      s.read.parquet(s"$dir/tri"),
      s.read.parquet(s"$dir/bi"),
      s.read.parquet(s"$dir/uni"),
      alpha, hotK)
}
