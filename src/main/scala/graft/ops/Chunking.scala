package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for embedding pipelines (LLM-data staple): split each
  * document into fixed-size character windows with overlap, one output row
  * per (doc, chunk index). Pure expression pipeline (sequence + transform +
  * posexplode) — fuses into the scan, shuffles nothing; at 100 TB this is
  * a map-only stage that multiplies rows by ~len/step.
  *
  * The chunk grid starts at 1, 1+step, 1+2·step, … while ≤ len(text)
  * (step = chunk − overlap); the tail chunk may be shorter. Deterministic
  * and portable (same semantics as SQL substr grids — see the q44 oracle).
  */
object Chunking {

  def chunkByChars(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got $chunkSize/$overlap")
    val step = chunkSize - overlap
    // backtick-quote the interpolated identifier (same policy as
    // MetaFilter) so column names with dots/spaces/hyphens parse as a
    // literal column, not a nested-field path
    val t = s"`${textCol.replace("`", "``")}`"
    // empty/null text yields zero chunks (sequence(1, 0) would throw)
    df.select(col(idCol),
      posexplode(expr(
        s"""CASE WHEN $t IS NULL OR length($t) = 0 THEN array()
           |ELSE transform(sequence(1, length($t), $step), s -> substring($t, s, $chunkSize)) END"""
          .stripMargin))
        .as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  /** Chunk + fingerprint, the usual pre-embedding shape: stable chunk ids
    * (doc, idx) plus a content hash for downstream dedup. */
  def chunkedFingerprints(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame =
    chunkByChars(df, idCol, textCol, chunkSize, overlap)
      .select(col(idCol), col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_fp"))

  /** Token-window chunking: fixed-size windows of whitespace tokens with
    * overlap, rejoined with single spaces — the chunk grid embedding
    * pipelines actually use (token budgets, not characters). Same
    * expression-only map-only shape as [[chunkByChars]]: grid starts at
    * token 1, 1+step, … while ≤ nTokens; tail window may be shorter.
    * Input is normalized (trim + collapse whitespace) first, so token
    * boundaries are unambiguous and the output is engine-portable. */
  def chunkByTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0,
      s"need chunkTokens > overlapTokens >= 0, got $chunkTokens/$overlapTokens")
    val step = chunkTokens - overlapTokens
    val t = s"`${textCol.replace("`", "``")}`"
    val norm = s"regexp_replace(trim(lower($t)), '\\\\s+', ' ')"
    df.select(col(idCol),
      posexplode(expr(
        s"""CASE WHEN $t IS NULL OR length($norm) = 0 THEN array()
           |ELSE transform(
           |  sequence(1, size(split($norm, ' ')), $step),
           |  s -> concat_ws(' ', slice(split($norm, ' '), s, $chunkTokens))) END"""
          .stripMargin))
        .as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
      .withColumn("n_tokens",
        size(split(col("chunk"), " ")).cast("long"))
  }
}
