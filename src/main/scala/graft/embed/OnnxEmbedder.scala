package graft.embed

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.util.hashing.MurmurHash3

/** Minimal onnxruntime-shaped seam: exactly the two calls the embedder
  * needs from a real `OrtSession` (run a [batch, seqLen] token-id tensor
  * to a [batch, dim] sentence-embedding tensor; release native memory).
  * A live build implements this with `OrtEnvironment.getEnvironment` +
  * `OrtSession`; tests implement it with a deterministic fake — either
  * way [[OnnxEmbedder]]'s tokenize → pad → run → L2-normalize path and
  * its per-JVM create-once lifecycle run for real.
  */
trait OnnxSession extends AutoCloseable {
  /** Run the model on a padded token-id batch; one [dim] vector per row,
    * in order (the reference takes output[1] as the sentence embedding,
    * src/onnx.rs:85-98). */
  def run(tokenIds: Array[Array[Long]]): Array[Array[Float]]
}

/** Creates an [[OnnxSession]] from a model directory. Serializable so the
  * strategy ships inside the embedder closure; the SESSION must not ship
  * (native handles don't serialize) — it is created lazily on each
  * executor via [[OnnxSessionCache]].
  */
trait OnnxSessionFactory extends Serializable {
  def create(modelDir: String): OnnxSession
}

object OnnxSessionFactory {
  /** Default in this build: no onnxruntime jar (zero-egress environment),
    * so session CREATION throws with guidance. The embedder's code path
    * up to that point — and after it, given any real factory — is live
    * and spec-covered. */
  val unavailable: OnnxSessionFactory = new OnnxSessionFactory {
    def create(modelDir: String): OnnxSession =
      throw new UnsupportedOperationException(
        "No onnxruntime available in this build: add the " +
          "com.microsoft.onnxruntime:onnxruntime dependency and pass a " +
          "factory wrapping OrtEnvironment/OrtSession, or use HashEmbedder")
  }
}

/** Executor-JVM-wide session cache: one [[OnnxSession]] per (modelDir,
  * factory-class) regardless of how many tasks deserialize the embedder
  * closure — a `@transient lazy val` alone would re-create the session per
  * task, recreating the reference's model-reload-per-batch problem
  * (onnx.rs:51-60) at task granularity. `createCount` exposes the
  * lifecycle to specs; [[shutdown]] closes everything (driver exit /
  * executor decommission hook).
  */
object OnnxSessionCache {
  private val sessions = new ConcurrentHashMap[String, OnnxSession]()
  private val creates = new AtomicLong(0)

  def getOrCreate(modelDir: String, factory: OnnxSessionFactory): OnnxSession =
    sessions.computeIfAbsent(s"${factory.getClass.getName}@$modelDir", { _ =>
      creates.incrementAndGet()
      factory.create(modelDir)
    })

  def createCount: Long = creates.get()

  /** Close and drop every cached session (idempotent). */
  def shutdown(): Unit = {
    val it = sessions.entrySet().iterator()
    while (it.hasNext) { it.next().getValue.close(); it.remove() }
  }
}

/** ONNX sentence-transformer embedder — the production counterpart of the
  * reference's `generate_embeddings` (src/onnx.rs:35-98: tokenize with a
  * HuggingFace tokenizer, run `model.onnx`, take output[1] as the [N, D]
  * sentence-embedding tensor).
  *
  * The full pipeline is live code: deterministic tokenize → pad to the
  * batch max → `session.run` → L2-normalize (the reference normalizes at
  * query time; doing it at embed time makes cosine = dot downstream). The
  * session comes from [[OnnxSessionCache]] — created once per executor
  * JVM and reused across tasks and batches, unlike the reference, which
  * reloads the model every 100-row batch (onnx.rs:51-60).
  *
  * Only the DEFAULT factory is environment-blocked: this build has no
  * onnxruntime jar, so [[OnnxSessionFactory.unavailable]] throws at
  * session creation. Every other line runs under spec with a fake
  * session ([[../../test/scala/graft/embed/OnnxEmbedderSpec]]).
  *
  * Tokenizer note: tokenizer.json parsing (vocab + wordpiece merges) is
  * out of scope without the tokenizer artifact; ids come from a stable
  * hash into a BERT-sized vocab instead. The TENSOR SHAPES — ragged
  * batch, right-padding, id dtype — are the real contract and are what
  * the plumbing and specs exercise.
  *
  * @param modelDir directory containing model.onnx + tokenizer.json
  *                 (reference layout, README.md:41-48)
  */
final case class OnnxEmbedder(
    modelDir: String,
    dim: Int = 384,
    factory: OnnxSessionFactory = OnnxSessionFactory.unavailable,
    maxSeqLen: Int = OnnxEmbedder.DefaultMaxSeqLen)
  extends Embedder {

  import OnnxEmbedder._

  require(maxSeqLen >= 3, s"maxSeqLen must fit [CLS] + token + [SEP], got $maxSeqLen")

  /** Per-call cache lookup, NOT a memoizing lazy val: the cache alone owns
    * session lifetime, so an embedder instance never pins a session that
    * [[OnnxSessionCache.shutdown]] already closed (a `ConcurrentHashMap`
    * hit per batch is noise next to a model run). */
  private def session: OnnxSession =
    OnnxSessionCache.getOrCreate(modelDir, factory)

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val ids = texts.map(t => truncate(tokenize(t), maxSeqLen)).toArray
    val maxLen = math.max(1, ids.iterator.map(_.length).max)
    val padded = ids.map(row => java.util.Arrays.copyOf(row, maxLen)) // 0 = [PAD]
    val out = session.run(padded)
    require(out.length == texts.length,
      s"session returned ${out.length} vectors for ${texts.length} inputs")
    out.toSeq.map(l2Normalize)
  }
}

object OnnxEmbedder {
  /** BERT-base vocab size — the id range a real tokenizer would emit. */
  val VocabSize = 30522

  /** BERT-family position-embedding limit: a longer batch dimension is a
    * RUNTIME model error, so long documents must be truncated before the
    * tensor is built, not trusted to the model. */
  val DefaultMaxSeqLen = 512

  /** Head-truncate to `maxSeqLen` ids preserving [CLS] … [SEP]: keep the
    * first maxSeqLen-1 ids and re-terminate with [SEP] (the standard
    * sentence-transformer truncation strategy). */
  private[embed] def truncate(ids: Array[Long], maxSeqLen: Int): Array[Long] =
    if (ids.length <= maxSeqLen) ids
    else {
      val out = java.util.Arrays.copyOf(ids, maxSeqLen)
      out(maxSeqLen - 1) = 102L // [SEP]
      out
    }

  /** [CLS] text-token ids [SEP], ids hashed into (reserved, VocabSize). */
  def tokenize(text: String): Array[Long] = {
    val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val out = new Array[Long](words.length + 2)
    out(0) = 101L // [CLS]
    var i = 0
    while (i < words.length) {
      out(i + 1) = 1000L +
        java.lang.Math.floorMod(MurmurHash3.stringHash(words(i)), VocabSize - 1000)
      i += 1
    }
    out(words.length + 1) = 102L // [SEP]
    out
  }

  private[embed] def l2Normalize(v: Array[Float]): Array[Float] = {
    var norm = 0.0; var i = 0
    while (i < v.length) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm == 0.0) return v
    val inv = 1.0 / math.sqrt(norm)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }
}
