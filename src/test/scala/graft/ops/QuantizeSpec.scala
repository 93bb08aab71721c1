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
}
