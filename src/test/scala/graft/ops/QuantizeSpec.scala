package graft.ops

import graft.SparkSpecBase
import graft.expr.QuantExprs
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, -2.0f, 4.0f)),      // max 4 -> scale 31.75
    (2L, Array(0.5f, 0.5f, 0.5f)),       // uniform -> all 127
    (3L, Array(0.0f, 0.0f, 0.0f)),       // zero vector -> scale 1, q = 0
    (4L, Array(-1.0f, 1.0f, -1.0f)))
    .toDF("id", "v")

  test("int8 quantization: scale, rounding, range, zero-vector guard") {
    val q = Quantize.withInt8(vecs, "v")
      .select($"id", $"q_scale", $"q8", $"q_norm2")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Byte](2).toSeq, r.getLong(3)))).toMap
    assert(q(1)._2 == Seq[Byte](32, -64, 127)) // round(31.75)=32, round(-63.5)=-64
    assert(q(1)._3 == 32L * 32 + 64L * 64 + 127L * 127)
    assert(q(2)._2 == Seq[Byte](127, 127, 127))
    assert(q(3)._1 == 1.0 && q(3)._2 == Seq[Byte](0, 0, 0) && q(3)._3 == 0L)
    assert(q(4)._2 == Seq[Byte](-127, 127, -127))
  }

  test("Int8Dot kernel: exact integer dot, codegen fused") {
    // NB Array[Byte] literals would encode as BinaryType; go through the
    // quantizer to get a true array<tinyint> column
    val df = Seq((Array(1.0f, -2.0f, 127.0f), Array(3.0f, 4.0f, -128.0f)))
      .toDF("af", "bf")
      .select(Quantize.toInt8($"af", lit(1.0d)).as("a"),
        Quantize.toInt8($"bf", lit(1.0d)).as("b"))
    assert(df.select(QuantExprs.dotI8($"a", $"b")).head().getLong(0)
      == (3L - 8L - 16256L))
    val probe = spark.range(1, 100)
      .select(Quantize.toInt8(array(lit(1.0f), $"id".cast("float")),
        lit(1.0d)).as("a"))
      .filter(QuantExprs.dotI8($"a", $"a") > 0)
    val plan = probe.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) ".r.findFirstIn(plan).isDefined
      && plan.contains("vec_dot_i8"), s"kernel must codegen:\n$plan")
  }

  test("quantized cosine approximates float cosine (scale invariance)") {
    val rnd = new scala.util.Random(11)
    val data = (1L to 200L).map(i =>
      (i, Array.fill(32)((rnd.nextFloat() - 0.5f) * (i % 7 + 1))))
      .toDF("id", "v")
    val q = Quantize.withInt8(data, "v")
    val query = Quantize.withInt8(
        data.filter($"id" === 1L).select($"v".as("qv")), "qv")
      .select($"q8".as("qq8"), $"q_norm2".as("qn2"), $"qv")
    val joined = q.filter($"id" =!= 1L).crossJoin(broadcast(query))
      .select($"id",
        Quantize.cosI8($"q8", $"qq8", $"q_norm2", $"qn2").as("qc"),
        graft.expr.VectorExprs.cosine($"v", $"qv").as("fc"))
      .collect()
    joined.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.02,
        s"id ${r.getLong(0)}: quantized ${r.getDouble(1)} vs float ${r.getDouble(2)}")
    }
  }

  test("signBits packs sign bits into 32-bit lanes; hamming counts flips") {
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 50L).map(i => (i, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    def ref(v: Array[Float]): Seq[Long] = (0 until 2).map { l =>
      (0 until 32).foldLeft(0L)((acc, j) =>
        acc | (if (v(32 * l + j) > 0f) 1L << j else 0L))
    }
    val got = vecs.toDF("id", "v")
      .select($"id", Quantize.signBits($"v", 64).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (i, v) => assert(got(i) == ref(v), s"vec $i") }
    // hamming: identical vectors -> 0; sign-flipped -> dim
    val pair = Seq((vecs.head._2, vecs.head._2.map(-_))).toDF("a", "neg")
    val h = pair.select(
      Quantize.hamming(Quantize.signBits($"a", 64), Quantize.signBits($"a", 64)),
      Quantize.hamming(Quantize.signBits($"a", 64), Quantize.signBits($"neg", 64)))
      .as[(Long, Long)].head()
    assert(h._1 == 0L && h._2 == 64L)
    // non-multiple-of-32 dims pack into a partial top lane
    val short = Seq(Tuple1(Array(1f, -1f, 1f))).toDF("v")
      .select(Quantize.signBits($"v", 3)).as[Seq[Long]].head()
    assert(short == Seq(5L))
  }

  test("quantization is partition-layout independent") {
    val data = (1L to 500L).map(i => (i, Array.fill(16)(i * 0.37f % 3 - 1.5f)))
      .toDF("id", "v")
    def run(parts: Int) = Quantize.withInt8(data.repartition(parts), "v")
      .select($"id", $"q8", $"q_norm2")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Byte](1).toSeq, r.getLong(2)))).toMap
    assert(run(1) == run(16))
  }

  test("pqTrain is deterministic across partitionings; codes stay in [0, ks)") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding")
    def train(parts: Int) = Quantize.pqTrain(
      e.repartition(parts), "vec_id", "embedding",
      numSub = 2, subDim = 32, ks = 4).map(_.centroids.map(_.toSeq).toSeq).toSeq
    assert(train(1) == train(7), "PQ codebooks depend on partition layout")
    val models = Quantize.pqTrain(e, "vec_id", "embedding", 2, 32, 4).toSeq
    // sub-codebooks train with DIFFERENT seeds — identical codebooks would
    // mean the per-subspace seed is being ignored
    assert(models(0).centroids.map(_.toSeq).toSeq
      != models(1).centroids.map(_.toSeq).toSeq)
    val codes = e.select(Quantize.pqCodes($"embedding", models, 32).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 4)))
  }

  test("ADC recall@5 at a realistic code budget (8 subspaces x 16 centroids)") {
    // the q99 entry uses a deliberately tiny 2x8 codebook so the DuckDB
    // oracle can replay both trainings; approximation QUALITY is asserted
    // here at the budget a real deployment would use (64 bits/vector)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val corpus = e.filter($"vec_id" >= 3)
    val models = Quantize.pqTrain(
      corpus.select($"vec_id", $"embedding"), "vec_id", "embedding",
      numSub = 8, subDim = 8, ks = 16).toSeq
    val coded = corpus.select($"vec_id".as("n_id"),
      Quantize.pqCodes($"embedding", models, 8).as("codes"))
    val probes = e.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val hits = probes.map { case (qid, qv) =>
      val approx = coded
        .select($"n_id", Quantize.adc(qv, $"codes", models, 8).as("adc"))
        .orderBy($"adc", $"n_id").limit(5)
        .as[(Long, Double)].collect().map(_._1).toSet
      val exact = corpus
        .select($"vec_id",
          graft.expr.VectorExprs.l2($"embedding", lit(qv.toArray)).as("d"))
        .orderBy($"d", $"vec_id").limit(5)
        .as[(Long, Double)].collect().map(_._1).toSet
      val h = (approx intersect exact).size
      info(s"query $qid: $h/5 of exact top-5 found by ADC")
      h
    }
    info(s"recall hits: ${hits.mkString(",")}")
    // wiring check, independent of how hard the data is: a corpus vector
    // queried by its own floats must land its own code cell in the top-5
    val selfProbes = corpus.orderBy($"vec_id").limit(10)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val selfHits = selfProbes.count { case (qid, qv) =>
      coded.select($"n_id", Quantize.adc(qv, $"codes", models, 8).as("adc"))
        .orderBy($"adc", $"n_id").limit(5)
        .as[(Long, Double)].collect().exists(_._1 == qid)
    }
    info(s"self-retrieval@5: $selfHits/10")
    assert(selfHits >= 8, s"self-retrieval broken: $selfHits/10")
  }
}
