package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Vector similarity/distance kernels over `ArrayType(FloatType)` columns.
  *
  * The reference computes an unnormalized dot product it calls "cosine"
  * (reference: src/embeddings.rs:365) and L2 distance via an external
  * KdTree crate (src/embeddings.rs:92,402-408). Here each kernel is a
  * native Catalyst `Expression` with whole-stage codegen (`doGenCode`
  * emits a tight primitive loop over the array buffers — no per-row lambda
  * allocation, no boxing), which is the 100 TB-scale path: the expression
  * runs inside WholeStageCodegen fused with the scan/filter above it.
  *
  * All kernels accumulate in double (float inputs widened per element) and
  * iterate in array order, so results are deterministic and bit-stable.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ — the reference's similarity (embeddings.rs:365). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖); 0.0 when either norm is zero.
  * One pass over both arrays (dot + both norms fused). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    if (na == 0.0d || nb == 0.0d) 0.0d
    else dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2(a, b) = sqrt(Σ (aᵢ-bᵢ)²) — the reference's KdTree metric
  * (embeddings.rs:92,402-408), as a flat scan kernel. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    java.lang.Math.sqrt(acc)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All L SRP-LSH bucket codes of a float vector in one fused pass:
  * quantize once (round(x·10⁶) as long — HALF_UP, engine-portable), then
  * L×b integer plane dots in a tight generated loop. Bit p of table t's
  * code = sign of ⟨q, plane_{t,p}⟩ with the deterministic integer planes
  * of [[graft.ops.Similarity.planesInt]] (seed + 1000·t per table) — the
  * exact arithmetic the DuckDB oracles replay. Output: array<long> of
  * length numTables. Replaces a 10-table union of lambda-aggregate
  * projections (L source scans, codegen-hostile) with one codegen'd
  * expression. */
case class SrpBuckets(child: Expression, numPlanes: Int, dim: Int,
    numTables: Int, seed: Long) extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 62, "numPlanes must be in [1, 62]")
  override def prettyName: String = "srp_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  @transient private lazy val planes: Array[Array[Array[Long]]] =
    Array.tabulate(numTables) { t =>
      graft.ops.Similarity.planesInt(numPlanes, dim, seed + 1000L * t)
    }

  /** round-half-away-from-zero, matching Spark/DuckDB round() on doubles. */
  private def q(x: Double): Long =
    (if (x < 0) math.ceil(x - 0.5d) else math.floor(x + 0.5d)).toLong

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val qv = new Array[Long](n)
    var d = 0
    while (d < n) { qv(d) = q(v.getFloat(d).toDouble * 1000000.0d); d += 1 }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L; var p = 0
      while (p < numPlanes) {
        val w = planes(t)(p); var dot = 0L; var i = 0
        while (i < n) { dot += qv(i) * w(i); i += 1 }
        if (dot > 0L) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket; t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("srpPlanes", planes, "long[][][]")
      val n = ctx.freshName("n"); val qv = ctx.freshName("qv")
      val d = ctx.freshName("d"); val xd = ctx.freshName("xd")
      val out = ctx.freshName("out"); val t = ctx.freshName("t")
      val p = ctx.freshName("p"); val w = ctx.freshName("w")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $qv = new long[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $xd = (double) $a.getFloat($d) * 1000000.0;
         |  $qv[$d] = (long) ($xd < 0 ? java.lang.Math.ceil($xd - 0.5)
         |                             : java.lang.Math.floor($xd + 0.5));
         |}
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    long[] $w = $pl[$t][$p];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) { $dot += $qv[$i] * $w[$i]; }
         |    if ($dot > 0L) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2(a: Column, b: Column): Column =
    ColumnBridge.column(L2Distance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def srpBuckets(v: Column, numPlanes: Int, dim: Int, numTables: Int,
      seed: Long): Column =
    ColumnBridge.column(SrpBuckets(ColumnBridge.expression(v),
      numPlanes, dim, numTables, seed))
}
