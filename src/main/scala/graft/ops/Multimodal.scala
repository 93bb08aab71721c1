package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (north-star extension; the reference is
  * text-only — SURVEY.md §2.3 "Multimodal columns").
  *
  * Model: media is an opaque `binary` payload column + a typed metadata
  * struct (modality, mime, width/height/duration). Feature extraction runs
  * as batched `mapPartitions` over the binary payloads — the same
  * executor-side batching shape as the embed operator, so a real decoder
  * drops in without plan changes.
  *
  * STUB boundary (explicitly marked, per the build brief): this container
  * has no image/audio codecs, so [[decodeStub]] computes a deterministic
  * 16-bin byte histogram as the stand-in "decoded feature" — the Spark-side
  * plumbing (schema, batching, partitioning, output shape) is real and
  * tested; swap `decodeStub` for a JNI/Java codec call to go live.
  */
object Multimodal {

  /** Typed metadata struct for a media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("modality", StringType),  // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** STUB decode: byte-value histogram (16 bins) normalized to [0,1].
    * Deterministic placeholder for a real image/audio decoder. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { bins(j) /= payload.length.toFloat; j += 1 }
    bins
  }

  /** Frame/segment sampling on the raw payload, with original chunk
    * indices: every `stride`-th chunk of `chunkSize` bytes (the
    * Spark-side shape of video frame sampling). Single home for the
    * sampling policy — [[sampleChunks]] and [[withFrameFeatures]] both
    * delegate here so the two can never drift. */
  def sampleChunksIndexed(payload: Array[Byte], chunkSize: Int,
      stride: Int): Seq[(Int, Array[Byte])] =
    if (payload == null) Seq.empty
    else payload.grouped(chunkSize).zipWithIndex
      .collect { case (c, i) if i % stride == 0 => (i, c) }.toSeq

  /** Sampled chunks without indices — see [[sampleChunksIndexed]]. */
  def sampleChunks(payload: Array[Byte], chunkSize: Int, stride: Int): Seq[Array[Byte]] =
    sampleChunksIndexed(payload, chunkSize, stride).map(_._2)

  /** Adds a `features: array<float>` column extracted from a binary payload
    * column via batched mapPartitions (batch shape = the embed operator's,
    * Embed.withEmbedding). */
  def withFeatures(df: DataFrame, payloadCol: String,
      featuresCol: String = "features", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(featuresCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode the whole batch in one native call
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ decodeStub(r.getAs[Array[Byte]](idx)))
        }
      }
    }(enc)
  }

  /** One row per sampled frame: every `stride`-th chunk of `chunkSize`
    * payload bytes becomes (frame_idx = original chunk index, frame
    * features via [[decodeStub]]) — the Spark-side shape of video frame
    * sampling (decode a subset of frames, one feature row each). Runs in
    * the same batched mapPartitions as [[withFeatures]]: map-only, the
    * explode happens executor-side after extraction, payload bytes never
    * shuffle. */
  def withFrameFeatures(df: DataFrame, payloadCol: String,
      chunkSize: Int = 4096, stride: Int = 2,
      featuresCol: String = "frame_features", batchSize: Int = 64): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val outSchema = df.schema
      .add("frame_idx", IntegerType)
      .add(featuresCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          sampleChunksIndexed(r.getAs[Array[Byte]](idx), chunkSize, stride)
            .iterator.map { case (i, c) =>
              Row.fromSeq(r.toSeq :+ i :+ decodeStub(c))
            }
        }
      }
    }(enc)
  }

  /** Media near-duplicate candidates by perceptual hash
    * ([[graft.expr.MediaKernel.avgHash64]] — the average-hash family used
    * for image near-dup): 64-bit payload fingerprint → Manku-style
    * block-combination banding (Manku, Jain & Das Sarma 2007, "Detecting
    * Near-Duplicates for Web Crawling") → banded equi-join → exact
    * Hamming verify on the candidates. The media twin of SimHash text
    * dedup: identical payloads collide on all bands; byte-level
    * perturbations that leave most regions' relative brightness unchanged
    * still collide on some band.
    *
    * Banding: the 64 bits split into 6 blocks (11,11,11,11,10,10); each
    * of the C(6,3) = 20 three-block combinations forms one band whose key
    * concatenates the three block values (≥ 32 bits). A pair within
    * Hamming distance 3 has its differing bits in at most 3 blocks, so at
    * least 3 blocks agree and some combination matches all three —
    * pigeonhole-COMPLETE for `maxHamming` ≤ 3 (enforced). A simpler
    * 4 × 16-bit scheme is also complete, but its random band collisions
    * grow as 4·N²/2¹⁷ — at N = 10⁹ images that is ~10¹³ spurious
    * candidate pairs before the verify. With ≥ 32-bit keys the random
    * collision mass is 20·N²/2³³ ≈ 10⁶× smaller: the banding stays
    * billion-image-safe at the cost of 20 rather than 4 explode rows per
    * image (8-byte hashes, not payloads).
    *
    * Scale: the fingerprint is a map-only codegen expression (payloads
    * never shuffle — only 8-byte hashes move); candidates come from an
    * equi-join on (band, key), never an all-pairs compare; the Hamming
    * filter runs BEFORE the distinct exchange so sub-threshold band
    * collisions never shuffle. */
  /** The 3-of-6-block banding of a (id, phash) frame: 20 (band, key)
    * rows per hash, key = the three block values packed disjointly
    * (shifts 22/11, blocks ≤ 11 bits — injective). Exposed at package
    * scope so the candidate-mass spec can count raw band collisions. */
  private[ops] def phashBands(hashes: DataFrame, idCol: String): DataFrame = {
    // block i = sizes(i) bits of the hash starting at offs(i); the mask
    // also clears shiftright's sign extension for the top block
    val sizes = Seq(11, 11, 11, 11, 10, 10)
    val offs = sizes.scanLeft(0)(_ + _)
    def block(i: Int) =
      shiftright(col("phash"), offs(i)).bitwiseAND(lit((1L << sizes(i)) - 1))
    val bandStructs = (0 until 6).combinations(3).toSeq.zipWithIndex.map {
      case (c, idx) =>
        struct(lit(idx).as("band"),
          (block(c(0)) * lit(1L << 22) + block(c(1)) * lit(1L << 11) +
            block(c(2))).as("key"))
    }
    hashes
      .select(col(idCol), col("phash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  def phashNearDup(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] for complete 3-of-6-block candidates, got $maxHamming")
    val hashes = df
      .select(col(idCol), graft.expr.MediaKernel.avgHash64Col(col(payloadCol)).as("phash"))
      .filter(col("phash").isNotNull)
    val banded = phashBands(hashes, idCol)
    val lhs = banded.select(col(idCol).as("a_id"), col("phash").as("a_hash"),
      col("band"), col("key"))
    val rhs = banded.select(col(idCol).as("b_id"), col("phash").as("b_hash"),
      col("band"), col("key"))
    lhs.join(rhs, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(a_hash ^ b_hash) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Partition-friendly media table layout helper: modality + size bucket
    * make good partition columns (bounded cardinality) for 100 TB media
    * lakes; the payload stays unsplit inside parquet binary pages. */
  def withLayoutColumns(df: DataFrame, payloadCol: String, metaCol: String): DataFrame =
    df.withColumn("modality", col(s"$metaCol.modality"))
      .withColumn("size_bucket",
        (floor(log2(length(col(payloadCol)).cast("double") + 1d))).cast("int"))
}
