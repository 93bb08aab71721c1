package graft.embed

import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpecBase

/** Deterministic OrtSession-shaped fake: "embeds" a padded token-id batch
  * by folding ids into dim buckets. Static counters (JVM-wide, like the
  * cache itself) observe the lifecycle across serialized task closures.
  */
object FakeOnnx {
  val created = new AtomicLong(0)
  val closed = new AtomicLong(0)
  val runs = new AtomicLong(0)

  def vector(ids: Array[Long], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < ids.length) {
      v((i + ids(i).toInt) % dim) += 1.0f + (ids(i) % 7)
      i += 1
    }
    v
  }

  class Factory(val dim: Int) extends OnnxSessionFactory {
    def create(modelDir: String): OnnxSession = {
      created.incrementAndGet()
      new OnnxSession {
        def run(tokenIds: Array[Array[Long]]): Array[Array[Float]] = {
          runs.incrementAndGet()
          val w = tokenIds.head.length
          require(tokenIds.forall(_.length == w), "batch must be rectangular")
          tokenIds.map(vector(_, dim))
        }
        def close(): Unit = closed.incrementAndGet()
      }
    }
  }
}

class OnnxEmbedderSpec extends SparkSpecBase {

  private def l2(v: Array[Float]): Double =
    math.sqrt(v.map(x => x.toDouble * x).sum)

  test("tokenize: [CLS] ids [SEP], hashed into the reserved-offset vocab") {
    val ids = OnnxEmbedder.tokenize("Hello, wOrld hello")
    assert(ids.head == 101L && ids.last == 102L)
    assert(ids.length == 5) // CLS + 3 tokens + SEP
    assert(ids(1) == ids(3), "case-insensitive: Hello == hello")
    assert(ids.tail.init.forall(id => id >= 1000L && id < OnnxEmbedder.VocabSize))
    assert(OnnxEmbedder.tokenize("").toSeq == Seq(101L, 102L))
  }

  test("embedBatch runs tokenize -> pad -> session.run -> L2-normalize") {
    val emb = OnnxEmbedder("/fake/model-a", dim = 8, factory = new FakeOnnx.Factory(8))
    val texts = Seq("one two three", "a much longer text with several words", "x")
    val got = emb.embedBatch(texts)
    assert(got.length == 3)
    got.foreach(v => assert(math.abs(l2(v) - 1.0) < 1e-5, "unit-normalized"))
    // replay the fake's arithmetic on the padded batch the embedder builds
    val ids = texts.map(OnnxEmbedder.tokenize)
    val maxLen = ids.map(_.length).max
    val want = ids.map(r =>
      OnnxEmbedder.l2Normalize(FakeOnnx.vector(java.util.Arrays.copyOf(r, maxLen), 8)))
    assert(got.map(_.toSeq) == want.map(_.toSeq))
    assert(emb.embedBatch(Seq.empty).isEmpty)
  }

  test("session is created once per JVM across batches, tasks and clones") {
    import spark.implicits._
    val before = FakeOnnx.created.get()
    val emb = OnnxEmbedder("/fake/model-b", dim = 8, factory = new FakeOnnx.Factory(8))
    // many partitions => many deserialized embedder clones, each calling
    // into the JVM-wide cache; plus repeated driver-side batches
    val df = (1 to 200).map(i => (i.toLong, s"doc number $i payload"))
      .toDF("id", "text").repartition(8)
    val out = Embed.withEmbedding(df, "text", "embedding", emb, batchSize = 16)
    assert(out.count() == 200)
    emb.embedBatch(Seq("again", "and again"))
    assert(FakeOnnx.created.get() - before == 1,
      "exactly one session for model-b despite 8 tasks + extra batches")
  }

  test("embedding output is deterministic across partitionings") {
    import spark.implicits._
    val emb = OnnxEmbedder("/fake/model-c", dim = 8, factory = new FakeOnnx.Factory(8))
    val rows = (1 to 60).map(i => (i.toLong, s"text $i of the corpus"))
    def run(parts: Int): Map[Long, Seq[Float]] =
      Embed.withEmbedding(rows.toDF("id", "text").repartition(parts),
          "text", "embedding", emb, batchSize = 7)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](2).toSeq).toMap
    assert(run(1) == run(13))
  }

  test("shutdown closes every cached session and is idempotent") {
    val emb = OnnxEmbedder("/fake/model-d", dim = 4, factory = new FakeOnnx.Factory(4))
    emb.embedBatch(Seq("warm up"))
    val closedBefore = FakeOnnx.closed.get()
    val createdBefore = FakeOnnx.created.get()
    OnnxSessionCache.shutdown()
    assert(FakeOnnx.closed.get() > closedBefore)
    OnnxSessionCache.shutdown() // idempotent: nothing left to close
    assert(FakeOnnx.closed.get() - closedBefore <= createdBefore)
    // cache refills lazily after shutdown
    emb.embedBatch(Seq("recreate"))
    assert(FakeOnnx.created.get() > createdBefore)
  }

  test("long inputs are truncated to maxSeqLen with [SEP] re-terminated") {
    val long = (1 to 700).map(i => s"w$i").mkString(" ")
    val full = OnnxEmbedder.tokenize(long)
    assert(full.length == 702, "beyond the BERT position-embedding limit")
    val cut = OnnxEmbedder.truncate(full, 512)
    assert(cut.length == 512 && cut.head == 101L && cut.last == 102L)
    assert(cut.init.toSeq == full.take(511).toSeq, "head-truncation keeps a prefix")
    // short inputs pass through untouched
    val short = OnnxEmbedder.tokenize("tiny doc")
    assert(OnnxEmbedder.truncate(short, 512) eq short)
    // the model never sees a wider-than-maxSeqLen tensor
    val emb = OnnxEmbedder("/fake/model-t", dim = 8,
      factory = new FakeOnnx.Factory(8), maxSeqLen = 16)
    val got = emb.embedBatch(Seq(long, "short"))
    val ids = Seq(long, "short")
      .map(t => OnnxEmbedder.truncate(OnnxEmbedder.tokenize(t), 16))
    val want = ids.map(r =>
      OnnxEmbedder.l2Normalize(FakeOnnx.vector(java.util.Arrays.copyOf(r, 16), 8)))
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("default factory throws at session creation with guidance") {
    val emb = OnnxEmbedder("/fake/model-e", dim = 4)
    val e = intercept[UnsupportedOperationException](emb.embedBatch(Seq("x")))
    assert(e.getMessage.contains("onnxruntime"))
    assert(e.getMessage.contains("HashEmbedder"))
  }
}
