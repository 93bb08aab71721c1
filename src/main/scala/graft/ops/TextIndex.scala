package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for lexical (BM25) retrieval — the text-side
  * analogue of the persisted IVF index (`ops/Ivf.writeIndex`): build
  * once, then serve queries by reading ONLY the probe terms' postings
  * via hive-partition pruning, instead of re-tokenizing the corpus per
  * query (what the from-scratch `TextAnalysis.bm25` must do).
  *
  * Layout under `path`:
  *   - `postings/` — (token, id, tf), hive-partitioned by
  *     `bucket = md5(token) mod buckets`, so a probe with its terms'
  *     bucket literals scans only those directories (PartitionFilters
  *     INSET — the q52 IVF-probe pattern, asserted in PlanShapeSpec);
  *   - `docstats/` — (id, dl) document lengths;
  *   - `stats/` — 1 row (n_docs, total_len).
  *
  * Serving is LOSSLESS: tf/df/dl/stats are exactly the values the
  * from-scratch path derives, and the score uses the shared
  * [[TextAnalysis.bm25MicroExpr]] expression tree, so index-backed
  * results are bit-identical to the recompute — q122's oracle IS q82's
  * from-scratch SQL.
  *
  * At 100 TB: the build is one tokenize + one (token, id) count
  * aggregate (map-side combined) — the same cost as a single BM25
  * query's tf pass — amortized over every query after; postings
  * shuffles carry (string, long, long) rows, never text.
  */
object TextIndex {

  /** `md5(token) mod buckets` as a Column — the postings partition key. */
  def termBucketCol(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(conv(substring(md5(term), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Driver-side twin of [[termBucketCol]] for literal probe terms —
    * identical md5-hex-prefix arithmetic, so the plan-time bucket
    * literals land on the same directories the build wrote. */
  def termBucket(term: String, buckets: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  /** Driver-side twin of the engine's normalization + tokenization
    * (Dedup.normText then whitespace split) for literal query strings. */
  def normTokens(text: String): Seq[String] =
    text.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").toSeq.filter(_.nonEmpty)

  /** Build and persist the index. One corpus pass. */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"need >= 1 buckets, got $buckets")
    val toks = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    toks.groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucketCol(col("token"), buckets))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/postings")
    val dl = TextAnalysis.docLengths(df, idCol, textCol)
    dl.write.mode("overwrite").parquet(s"$path/docstats")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a new document batch to an existing index WITHOUT touching
    * the already-indexed corpus — the operational ingest mode (the
    * text-side twin of `Ivf.appendToIndex`): postings and doc lengths
    * are purely additive ((term, id, tf) rows from the batch alone), and
    * the 1-row corpus stats are re-aggregated from the appended
    * docstats — a doc-count-sized scan, NOT a re-tokenize. Serving after
    * append must equal a one-shot build over the union (TextIndexSpec +
    * the q123 oracle prove it). Batch ids must be disjoint from the
    * indexed ids — postings/doclengths for a re-ingested id would
    * double-count (same contract as the IVF append). */
  def appendToIndex(batch: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"need >= 1 buckets, got $buckets")
    val toks = batch
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    toks.groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucketCol(col("token"), buckets))
      .write.partitionBy("bucket").mode("append")
      .parquet(s"$path/postings")
    TextAnalysis.docLengths(batch, idCol, textCol)
      .write.mode("append").parquet(s"$path/docstats")
    val spark = batch.sparkSession
    // stats re-derive from the (doc-count-sized) appended docstats; write
    // to a fresh subdir then swap the reader path is unnecessary here —
    // overwrite of a 1-row table is atomic enough for the single-writer
    // maintenance contract this mirrors from Ivf.appendToIndex
    val fresh = spark.read.parquet(s"$path/docstats")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
      .collect()(0)
    import spark.implicits._
    Seq((fresh.getLong(0), fresh.getLong(1))).toDF("n_docs", "total_len")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 scores for literal `queries` (q_id, query text) against a
    * prebuilt index: returns (q_id, id, sum_micro, bm25) — ranking/top-k
    * is the caller's (it differs per entry). The postings scan is pruned
    * to the probe terms' buckets at PLAN time (literal INSET). df comes
    * from the pruned postings (count per term = exactly the from-scratch
    * docFreq). */
  def probeIndex(s: SparkSession, path: String, idCol: String,
      queries: Seq[(Long, String)], buckets: Int = 64,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries
      .flatMap { case (q, t) => normTokens(t).distinct.map(q -> _) }.distinct
    val probeTerms = qTerms.map(_._2).distinct
    require(probeTerms.nonEmpty, "queries produced no probe terms")
    val bucketLits = probeTerms.map(termBucket(_, buckets)).distinct
    val postings = s.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(bucketLits.map(x => x: Any): _*))
      .filter(col("token").isin(probeTerms.map(x => x: Any): _*))
      .select(col("token"), col(idCol), col("tf"))
    val docFreq = postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val dl = s.read.parquet(s"$path/docstats")
    val stats = s.read.parquet(s"$path/stats")
    import s.implicits._
    val qt = qTerms.toDF("q_id", "token")
    postings.join(broadcast(docFreq), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("_micro", TextAnalysis.bm25MicroExpr(k1, b))
      .join(broadcast(qt), Seq("token"))
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col("_micro")).as("sum_micro"))
      .withColumn("bm25", round(col("sum_micro").cast("double") / lit(1e6d), 6))
  }
}
