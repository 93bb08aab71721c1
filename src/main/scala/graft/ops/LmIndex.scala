package graft.ops

import org.apache.hadoop.fs.Path
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
  * Layout: one DELTA DIRECTORY per build/append —
  * `<dir>/m_<uuid>/{tri,bi,uni}` parquet tables with the
  * [[TextAnalysis.trigramModel]] schemas; [[score]] reads
  * `<dir>/m_*\/tri` etc. and re-aggregates, so counts stay additive
  * across any number of deltas.
  *
  * Atomicity: each delta is fully written to a `tmp_<uuid>` staging
  * directory and PROMOTED with ONE filesystem rename — atomic on
  * HDFS/POSIX (not on S3, where a real deployment puts a manifest log
  * in front, the table-format answer). A crash mid-append therefore
  * leaves the live model EXACTLY as it was: either the whole
  * tri/bi/uni delta appears or none of it does, never a model with
  * inconsistent n-gram orders. Orphaned `tmp_*` directories from
  * crashed writers are invisible to [[score]] (the glob matches only
  * `m_*`) and safe to garbage-collect.
  *
  * At 100 TB, bucket `tri` by a hash of (w1, w2, w3) and `bi`/`uni` by
  * their keys so the probe joins can co-locate; counts are
  * vocabulary-sized either way. */
object LmIndex {

  /** Train: write the three count tables as the first delta. One scan
    * of the training text per n-gram order, all map-side combined.
    *
    * Overwrite semantics: the NEW delta is fully staged first, then
    * previous `m_*` deltas are deleted, then the staged delta is
    * promoted — so a crash before the deletes leaves the OLD model
    * fully intact, and the exposed window (between delete and rename)
    * is two metadata operations, not three table writes. A rebuild is
    * inherently not atomic without a manifest pointer; incremental
    * updates should prefer [[append]], which IS atomic. Stale `tmp_*`
    * staging directories from crashed writers are garbage-collected
    * here. */
  def build(train: DataFrame, textCol: String, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(
      train.sparkSession.sparkContext.hadoopConfiguration)
    val base = new Path(dir)
    if (fs.exists(base))
      fs.listStatus(base).filter(_.getPath.getName.startsWith("tmp_"))
        .foreach(st => fs.delete(st.getPath, true))
    val staged = stageDelta(train, textCol, dir)
    if (fs.exists(base))
      fs.listStatus(base).filter(_.getPath.getName.startsWith("m_"))
        .foreach(st => fs.delete(st.getPath, true))
    promote(fs, staged)
  }

  /** Incrementally extend the model with a new training batch: n-gram
    * counts are ADDITIVE, so the batch's own count tables land as one
    * more delta directory — no read, no merge job, no model rebuild;
    * [[score]] re-aggregates per key at read time (one
    * vocabulary-sized combiner groupBy). The delta commits with a
    * single atomic rename (see the object scaladoc), so "append ≡
    * rebuild" holds for every append that returns — a failed append
    * leaves the model unchanged. Proven in spec and by the q170 oracle
    * hash match. */
  def append(batch: DataFrame, textCol: String, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    promote(fs, stageDelta(batch, textCol, dir))
  }

  /** Write the batch's three count tables under `tmp_<uuid>`; returns
    * the staging path. Invisible to [[score]] until promoted. */
  private def stageDelta(df: DataFrame, textCol: String, dir: String): Path = {
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val staging = s"$dir/tmp_$uuid"
    val (tri, bi, uni) = TextAnalysis.trigramModel(df, textCol)
    tri.write.mode("overwrite").parquet(s"$staging/tri")
    bi.write.mode("overwrite").parquet(s"$staging/bi")
    uni.write.mode("overwrite").parquet(s"$staging/uni")
    new Path(staging)
  }

  /** The one-rename commit: `tmp_<uuid>` → `m_<uuid>`. */
  private def promote(fs: org.apache.hadoop.fs.FileSystem, staging: Path): Unit = {
    val committed = new Path(staging.getParent,
      staging.getName.replaceFirst("^tmp_", "m_"))
    require(fs.rename(staging, committed),
      s"LmIndex delta promote failed: rename $staging -> $committed")
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
      s.read.parquet(s"$dir/m_*/tri").groupBy(col("w1"), col("w2"), col("w3"))
        .agg(sum(col("c123")).as("c123")),
      s.read.parquet(s"$dir/m_*/bi").groupBy(col("wa"), col("wb"))
        .agg(sum(col("cab")).as("cab")),
      s.read.parquet(s"$dir/m_*/uni").groupBy(col("w"))
        .agg(sum(col("c")).as("c")),
      alpha, hotK)
  }
}
