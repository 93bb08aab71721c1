package graft.streaming

import graft.ops.{Dedup, PiiScrub, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-curation ingest: the batch curation ladder — rule
  * quality gate (q127), PII redaction (q66), cross-batch exact dedup
  * against a persisted fingerprint index (the q65 incremental pattern) —
  * applied at ingest time via `foreachBatch`, so a document that fails
  * quality, or whose normalized fingerprint was EVER seen before, never
  * lands in the corpus.
  *
  * Exactly-once output: every batch writes to `batch=<id>` directories
  * with overwrite, so a replayed micro-batch (checkpoint recovery)
  * rewrites the same files instead of duplicating them — the same
  * recovery discipline EventStreamsSpec proves for the event pipelines.
  *
  * Scale: the per-batch work is the batch-sized quality/scrub
  * projection plus ONE left-anti equi-join of batch fingerprints
  * against the index scan (md5-keyed; at 100 TB the index is bucketed
  * by fingerprint prefix and the join prunes to the batch's buckets).
  * No unbounded streaming state store — the index IS the state,
  * persisted and shared with the batch dedup operators.
  */
object CurationIngest {

  /** One micro-batch of the curated ingest — extracted from the
    * foreachBatch closure so the replay-idempotence spec can drive it
    * directly with a chosen batchId.
    *
    * Replay safety (the crash-between-index-write-and-checkpoint-commit
    * case): the dedup index read EXCLUDES the current batch's own
    * `batch=<batchId>` partition. Without that exclusion, a replayed
    * batch finds its OWN fingerprints (written moments before the
    * crash) already in the index, classifies every document as seen,
    * and overwrites `outDir/batch=<id>` as EMPTY — permanently losing
    * the batch while its fingerprints keep it from ever re-admitting.
    * With the exclusion, a replay reproduces the original `fresh` set
    * bit-for-bit and the overwrite rewrites identical files. Index
    * existence is probed through the Hadoop FileSystem API (works on
    * HDFS/S3, not just the driver-local filesystem), and only `batch=*`
    * partition directories count — a bare directory left by a crashed
    * first write reads as an empty index, not a schema-inference error. */
  def processBatch(
      batch: DataFrame, batchId: Long,
      idCol: String, textCol: String,
      indexDir: String, outDir: String,
      minWords: Int = 5): Unit = {
    val spark = batch.sparkSession
    val keep = TextAnalysis
      .gopherRules(batch, idCol, textCol, minWords = minWords)
      .filter(col("keep") === 1L)
      .select(col(idCol))
    val scrub = PiiScrub.scrub(batch.join(keep, idCol), idCol, textCol)
      .select(col(idCol), col("redacted"),
        (col("n_emails") + col("n_ips") + col("n_phones")).as("n_redacted"))
    val fps = scrub.withColumn("_fp", Dedup.fingerprint(col("redacted")))
    // deterministic within-batch representative: min id per fingerprint
    val reps = fps.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
      .join(fps, Seq("_fp", idCol))
    val indexPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = indexPath.getFileSystem(spark.sessionState.newHadoopConf())
    val hasIndex = fs.exists(indexPath) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(indexPath, "batch=*")).nonEmpty
    val known =
      if (hasIndex)
        spark.read.parquet(indexDir)
          .filter(col("batch") =!= batchId) // never dedup against ourself
          .select(col("_fp"))
      else spark.emptyDataFrame.select(lit("").as("_fp")).limit(0)
    val fresh = reps.join(known, Seq("_fp"), "left_anti")
      .localCheckpoint(true) // one pass feeds both sinks
    fresh.select(col(idCol), col("redacted"), col("n_redacted"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    fresh.select(col("_fp"))
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    ()
  }

  /** Start the curated ingest: docsStream(idCol, textCol) → quality
    * gate → PII-redacted text → never-seen-before docs appended under
    * `outDir/batch=<id>`, their fingerprints under `indexDir/batch=<id>`. */
  def curatedAppend(
      docsStream: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      outDir: String,
      checkpointDir: String,
      minWords: Int = 5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, outDir, minWords)
      }
      .start()
}
