package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Text → dense `Array[Float]` embedding, batched.
  *
  * Mirrors the reference's embedding surface (`generate_embeddings` /
  * `batch_embeddings`, reference: src/onnx.rs:35-132) as a Serializable
  * strategy object shipped to executors: any expensive state (an ONNX
  * session, a tokenizer) lives in `@transient lazy val`s so it is created
  * once per executor JVM — not per row, and (unlike the reference, which
  * reloads the model every 100-row batch, onnx.rs:51-60) not per batch.
  */
trait Embedder extends Serializable {
  /** Embedding dimensionality (reference default 384, onnx.rs:20-23). */
  def dim: Int
  /** Embed one batch of texts; must return one vector per input, in order.
    * (The reference's every-100th-row zero-vector bug, onnx.rs:112-123, is
    * intent-corrected here: all rows embedded — SURVEY.md §7.4.) */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** The embed operator: adds an embedding column to a DataFrame via
  * `mapPartitions` with grouped batches — the Spark-native form of the
  * reference's `save()`-time batch embed (embeddings.rs:285-306). Batching
  * amortizes per-call model overhead; partitioning gives executor-level
  * parallelism the reference lacks (single thread, SURVEY.md §3.4).
  */
object Embed {
  val DefaultBatchSize = 100 // reference BATCH_SIZE, onnx.rs:17

  def withEmbedding(
      df: DataFrame,
      textCol: String,
      outCol: String,
      embedder: Embedder,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // null documents embed as empty text (zero vector) rather than NPE
        val vecs = embedder.embedBatch(batch.map { r =>
          if (r.isNullAt(textIdx)) "" else r.getString(textIdx)
        })
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(enc)
  }
}
