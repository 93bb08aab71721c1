package graft.embed

/** The reference's model-type enum (embeddings.rs:116-125): two bundled
  * sentence-transformer configs plus Custom. Dim default 384, overridable
  * for custom models (the reference reads VALENTINUS_CUSTOM_DIM,
  * onnx.rs:20-23; here it's an explicit parameter — env-dependent schema
  * is a misfeature at scale).
  */
sealed abstract class ModelType(val key: String, val dim: Int)

object ModelType {
  /** Reference default (embeddings.rs:122). */
  case object AllMiniLmL6V2 extends ModelType("all-mini-lm-l6-v2", 384)
  case object AllMiniLmL12V2 extends ModelType("all-mini-lm-l12-v2", 384)
  final case class Custom(modelKey: String, customDim: Int)
    extends ModelType(modelKey, customDim)
  /** The offline deterministic stand-in used throughout tests. */
  case object Hash extends ModelType("hash", 64)

  def fromKey(key: String, dim: Int = 384): ModelType = key match {
    case AllMiniLmL6V2.key  => AllMiniLmL6V2
    case AllMiniLmL12V2.key => AllMiniLmL12V2
    case Hash.key           => Hash
    case other              => Custom(other, dim)
  }

  /** Embedder factory: the hash stand-in is live; ONNX types get the
    * stubbed session-per-executor embedder (see OnnxEmbedder). */
  def embedder(mt: ModelType, modelDir: String = ""): Embedder = mt match {
    case Hash => HashEmbedder(dim = Hash.dim)
    case m    => OnnxEmbedder(modelDir, m.dim)
  }
}
