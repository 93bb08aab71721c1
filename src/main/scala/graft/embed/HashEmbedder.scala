package graft.embed

import scala.util.hashing.MurmurHash3

/** Deterministic, dependency-free sentence embedder: seeded hash-projection
  * ("feature hashing" / random-projection bag-of-words). Stands in for the
  * reference's ONNX sentence-transformer (src/onnx.rs:35-132) in offline
  * tests and pipelines, per SURVEY.md §5.2 — same signature and column
  * shapes, fully reproducible across JVMs and partitions.
  *
  * Construction: tokenize on non-alphanumerics, lowercase; each token
  * contributes a pseudo-random ±unit pattern derived from
  * splitmix64(murmur3(token) ⊕ seed ⊕ dimension); the sum is L2-normalized.
  * Pure JVM arithmetic — no RNG state, no ordering sensitivity.
  */
final case class HashEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def embedOne(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    val tokens = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    var t = 0
    while (t < tokens.length) {
      val th = MurmurHash3.stringHash(tokens(t), seed).toLong
      var d = 0
      while (d < dim) {
        val h = splitmix64(th * 0x100000001b3L + d)
        // map 64-bit hash to [-1, 1)
        acc(d) += (h >> 11).toDouble / (1L << 52).toDouble
        d += 1
      }
      t += 1
    }
    var norm = 0.0; var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    out
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embedOne)
}
