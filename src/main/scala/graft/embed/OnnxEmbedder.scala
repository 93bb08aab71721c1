package graft.embed

/** ONNX sentence-transformer embedder — the production counterpart of the
  * reference's `generate_embeddings` (src/onnx.rs:35-98: tokenize with a
  * HuggingFace tokenizer, run `model.onnx`, take output[1] as the [N, D]
  * sentence-embedding tensor).
  *
  * STUB: the `onnxruntime` JVM artifact is not bundled in this build
  * environment (zero-egress, Spark jars only), so `embedBatch` throws.
  * The Spark-side plumbing this plugs into (Embed.withEmbedding:
  * mapPartitions + grouped batches + per-executor lazy session) is real and
  * tested with [[HashEmbedder]], which is signature-identical. To go live:
  * add `com.microsoft.onnxruntime:onnxruntime` and replace `session()`/
  * `run()` with `OrtEnvironment.getEnvironment` + `OrtSession` calls —
  * created lazily per executor (fixing the reference's model-reload-per-
  * batch issue, onnx.rs:51-60).
  *
  * @param modelDir directory containing model.onnx + tokenizer.json
  *                 (reference layout, README.md:41-48)
  */
final case class OnnxEmbedder(modelDir: String, dim: Int = 384) extends Embedder {
  // In a live build: @transient lazy val session = ... (one per executor JVM)
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    throw new UnsupportedOperationException(
      "OnnxEmbedder is a stub in this build (no onnxruntime jar available); " +
        "use HashEmbedder, or add the onnxruntime dependency — see scaladoc")
}
