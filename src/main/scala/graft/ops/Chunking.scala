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

  /** T5-style SPAN CORRUPTION (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective data prep: the token stream is cut into
    * `blockLen`-token blocks, each FULL block loses one `spanLen`-token
    * span at a deterministic md5-chosen offset, the input replaces
    * every lost span with its ordinal sentinel `<extra_id_b>`, and the
    * target is the sentinel-delimited concatenation of the lost spans
    * closed by the final sentinel — exactly the (input, target) pair a
    * span-corruption pretraining run consumes.
    *
    * Determinism (no RNG anywhere): the offset inside block b is
    * md5(doc_id:b)'s first 8 hex chars mod (blockLen − spanLen + 1) —
    * the q46/q61 md5 device, bit-replayable in DuckDB — so the corpus
    * transformation is a pure function of content and ids: reruns,
    * retries and engines agree byte-for-byte.
    *
    * Documents shorter than one full block carry no span and are
    * dropped (nothing to learn from); the trailing partial block
    * passes through uncorrupted into the input. Plan: MAP-ONLY — one
    * projection of array expressions inside codegen, no explode, no
    * shuffle; the heaviest cost is the md5 per block, ~L∕blockLen
    * hashes per document. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 8, spanLen: Int = 2): DataFrame = {
    require(blockLen >= 2 && blockLen <= 4096,
      s"blockLen must be in [2, 4096], got $blockLen")
    require(spanLen >= 1 && spanLen < blockLen,
      s"spanLen must be in [1, blockLen), got $spanLen")
    val B = blockLen
    val S = spanLen
    val M = B - S + 1
    val id = s"`${idCol.replace("`", "``")}`"
    val t = s"`${textCol.replace("`", "``")}`"
    val norm = s"regexp_replace(trim(lower($t)), '\\\\s+', ' ')"
    val off = s"cast(conv(substring(md5(concat(cast($id as string), ':', " +
      s"cast(b as string))), 1, 8), 16, 10) as bigint) % $M"
    df.select(col(idCol),
        expr(s"filter(split($norm, ' '), x -> length(x) > 0)").as("_w"))
      .withColumn("_nb", expr(s"size(_w) div $B").cast("long"))
      .filter(col("_nb") >= 1L)
      .withColumn("_inp", expr(
        s"""concat(
           |  flatten(transform(sequence(0, int(_nb) - 1), b ->
           |    concat(
           |      slice(_w, b * $B + 1, int($off)),
           |      array(concat('<extra_id_', cast(b as string), '>')),
           |      slice(_w, b * $B + int($off) + $S + 1, $B - int($off) - $S)))),
           |  slice(_w, int(_nb) * $B + 1, size(_w) - int(_nb) * $B))""".stripMargin))
      .withColumn("_tgt", expr(
        s"""concat(
           |  flatten(transform(sequence(0, int(_nb) - 1), b ->
           |    concat(
           |      array(concat('<extra_id_', cast(b as string), '>')),
           |      slice(_w, b * $B + int($off) + 1, $S)))),
           |  array(concat('<extra_id_', cast(_nb as string), '>')))""".stripMargin))
      .select(col(idCol),
        expr("array_join(_inp, ' ')").as("input_text"),
        expr("array_join(_tgt, ' ')").as("target_text"),
        col("_nb").as("n_spans"))
  }
}
