package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `spectral_moments(vm, dims)` — the one-pass exact-integer moment
  * kernel behind [[graft.ops.Spectral.topComponent]]: given micro-
  * quantized vector components `vm: array<bigint>`, accumulates in a
  * single corpus scan
  *
  *   n                       — the row count,
  *   sx(p)   = Σ vmₚ         — per-dimension component sums,
  *   sxy(p,q)= Σ vmₚ·vm_q    — the UPPER-TRIANGLE (p ≤ q) second moments,
  *
  * all in 128-bit two's-complement arithmetic (hi/lo `Array[Long]`
  * pairs), so the sums are exact at any corpus size — per-row products
  * are capped at ~9·10¹⁸ by the component guard below and 128 bits
  * absorb 2⁶⁴ rows of them. Replaces the explode-to-(p, q, prod) +
  * groupBy formulation, which shuffled dims²/2 rows per partition and
  * scanned the corpus three times (pair moments, component sums, row
  * count) — this kernel is one scan, one dims-bounded buffer per
  * partial, one merged row out.
  *
  * Output: `struct<n: bigint, sx: array<string>, sxy: array<string>>`
  * with the sums as decimal strings (driver parses BigInt — strings
  * sidestep DECIMAL(38)'s 10³⁸ ceiling, which a 128-bit sum can
  * legitimately exceed). Triangle layout: row-major with p ≤ q, cell
  * (p, q) at index p·dims − p·(p−1)/2 + (q − p).
  *
  * Typed failures (the module's degenerate-input discipline): a NULL
  * vector, a vector whose length ≠ dims, a NULL component, or a
  * component beyond ±3·10⁹ micro-units (the exact-product bound) each
  * raise IllegalArgumentException naming the offence — never a silently
  * skipped row or a wrong covariance.
  *
  * Buffer memory: (dims·(dims+1)/2 + dims) × 16 B ≈ dims² × 8 B per
  * partial — the reason [[graft.ops.Spectral.topComponent]] caps dims
  * at 1024 (≈ 8.4 MB per partial buffer). */
case class SpectralMoments(
    child: Expression,
    dims: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuffer] with UnaryLike[Expression] {
  // the 1024 ceiling is the buffer-memory bound from the scaladoc
  // (≈ 8.4 MB per partial at 1024); it also keeps dims·(dims+1)/2 far
  // from Int overflow — enforced HERE, not just at the operator layer,
  // because the expression is public API (KernelBench uses it directly)
  require(dims >= 1 && dims <= 1024, s"dims must be in [1, 1024], got $dims")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "spectral_moments expects array<bigint> micro-quantized " +
            s"components, got ${other.simpleString} — cast/quantize first " +
            "(a float array read as longs would silently corrupt the moments)")
    }

  override def prettyName: String = "spectral_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("sxy", ArrayType(StringType, containsNull = false), nullable = false)))

  private val maxAbs = 3000000000L // |vm| bound keeping vmₚ·vm_q < 2⁶³

  override def createAggregationBuffer(): MomentsBuffer = new MomentsBuffer(dims)

  override def update(buf: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null)
      throw new IllegalArgumentException(
        "spectral_moments: NULL vector — filter or repair the corpus first")
    if (arr.numElements() != dims)
      throw new IllegalArgumentException(
        s"spectral_moments: vector length ${arr.numElements()} != dims $dims " +
          "— a short/long vector would silently corrupt the covariance")
    var p = 0
    var idx = 0
    while (p < dims) {
      if (arr.isNullAt(p))
        throw new IllegalArgumentException(
          s"spectral_moments: NULL component at position $p")
      val vp = arr.getLong(p)
      if (vp > maxAbs || vp < -maxAbs)
        throw new IllegalArgumentException(
          s"spectral_moments: component $vp exceeds ±$maxAbs micro-units — " +
            "outside the exact-product range")
      buf.addSx(p, vp)
      var q = p
      while (q < dims) {
        buf.addT(idx, vp * arr.getLong(q))
        idx += 1
        q += 1
      }
      p += 1
    }
    buf.n += 1
    buf
  }

  override def merge(a: MomentsBuffer, b: MomentsBuffer): MomentsBuffer = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: MomentsBuffer): Any = {
    val sx = new Array[Any](dims)
    var i = 0
    while (i < dims) {
      sx(i) = UTF8String.fromString(buf.sxBig(i).toString)
      i += 1
    }
    val nt = dims * (dims + 1) / 2
    val t = new Array[Any](nt)
    i = 0
    while (i < nt) {
      t(i) = UTF8String.fromString(buf.tBig(i).toString)
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(sx), new GenericArrayData(t))
  }

  override def serialize(buf: MomentsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < dims) {
      out.writeLong(buf.sxHi(i)); out.writeLong(buf.sxLo(i)); i += 1
    }
    val nt = dims * (dims + 1) / 2
    i = 0
    while (i < nt) {
      out.writeLong(buf.tHi(i)); out.writeLong(buf.tLo(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MomentsBuffer(dims)
    buf.n = in.readLong()
    var i = 0
    while (i < dims) {
      buf.sxHi(i) = in.readLong(); buf.sxLo(i) = in.readLong(); i += 1
    }
    val nt = dims * (dims + 1) / 2
    i = 0
    while (i < nt) {
      buf.tHi(i) = in.readLong(); buf.tLo(i) = in.readLong(); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpectralMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpectralMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpectralMoments =
    copy(child = newChild)
}

/** 128-bit two's-complement accumulators: each cell is (hi, lo) with lo
  * treated as unsigned. Addition of a signed 64-bit value sign-extends
  * it into the high word and propagates the unsigned carry out of the
  * low word — the textbook 128-bit add, exact for 2⁶⁴ summands. */
final class MomentsBuffer(dims: Int) {
  var n: Long = 0L
  val sxHi = new Array[Long](dims)
  val sxLo = new Array[Long](dims)
  val tHi = new Array[Long](dims * (dims + 1) / 2)
  val tLo = new Array[Long](dims * (dims + 1) / 2)

  @inline private def carryOut(a: Long, b: Long, sum: Long): Long =
    ((a & b) | ((a | b) & ~sum)) >>> 63

  @inline def addSx(i: Int, v: Long): Unit = {
    val s = sxLo(i) + v
    sxHi(i) += (v >> 63) + carryOut(sxLo(i), v, s)
    sxLo(i) = s
  }

  @inline def addT(i: Int, v: Long): Unit = {
    val s = tLo(i) + v
    tHi(i) += (v >> 63) + carryOut(tLo(i), v, s)
    tLo(i) = s
  }

  def mergeFrom(b: MomentsBuffer): Unit = {
    n += b.n
    var i = 0
    while (i < sxHi.length) {
      val s = sxLo(i) + b.sxLo(i)
      sxHi(i) += b.sxHi(i) + carryOut(sxLo(i), b.sxLo(i), s)
      sxLo(i) = s
      i += 1
    }
    i = 0
    while (i < tHi.length) {
      val s = tLo(i) + b.tLo(i)
      tHi(i) += b.tHi(i) + carryOut(tLo(i), b.tLo(i), s)
      tLo(i) = s
      i += 1
    }
  }

  private val two64 = BigInt(1) << 64
  private val loMask = two64 - 1
  @inline private def big(hi: Long, lo: Long): BigInt =
    (BigInt(hi) << 64) + (BigInt(lo) & loMask)

  def sxBig(i: Int): BigInt = big(sxHi(i), sxLo(i))
  def tBig(i: Int): BigInt = big(tHi(i), tLo(i))
}

object SpectralMoments {
  /** Aggregate column over a micro-quantized `array<bigint>` vector
    * column; see the case-class scaladoc for layout and contract. */
  def of(vm: Column, dims: Int): Column =
    ColumnBridge.column(
      SpectralMoments(ColumnBridge.expression(vm), dims).toAggregateExpression())
}
