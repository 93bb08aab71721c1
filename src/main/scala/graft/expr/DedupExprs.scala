package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document dedup-sketch kernels (MinHash signature, SimHash
  * fingerprint) as native Catalyst Expressions.
  *
  * Both sketches are functions of one document, yet the expression-only
  * pipelines compute them with explode + distinct/groupBy — two shuffles
  * of ~tokens·docs rows to regroup values that were never apart. Each
  * kernel instead makes one pass over the normalized text's UTF-8 bytes
  * (tokens/shingles are contiguous byte ranges — normText collapses
  * whitespace to single 0x20 bytes, which in UTF-8 never occur inside a
  * multi-byte sequence), hashing ranges in place with the same XXH64
  * (seed 42) that `functions.xxhash64` uses, so outputs are bit-identical
  * to the portable pipelines. Map-only at any scale.
  *
  * Precondition: input is already normalized (trimmed, single-space
  * separated) — compose via [[graft.ops.Dedup.normText]] as the builders
  * in Dedup do.
  *
  * Two exact algebraic identities make kernel == pipeline:
  *  - min over a multiset equals min over its distinct set, so MinHash
  *    needs no shingle dedup;
  *  - per-occurrence ±1 bit votes sum to the tf-weighted votes, so
  *    SimHash needs no token-frequency grouping.
  */
object DedupKernel {
  final val P = 2147483647L // 2^31 - 1, the MinHash permutation modulus
  final val Seed = 42L // functions.xxhash64 default seed

  /** Deterministic per-permutation affine coefficients from splitmix64 —
    * must match Dedup.perm exactly (same constants). */
  def perm(i: Int): (Long, Long) = {
    var x = i.toLong + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    val a = 1L + java.lang.Math.floorMod(x, P - 1)
    val b = java.lang.Math.floorMod(x ^ (x >>> 31), P)
    (a, b)
  }

  /** MinHash signature of the w-shingle multiset: for every run of w
    * consecutive words (= the byte range from the first word's start to
    * the last word's end), h = xxhash64(range) mod P, then numHashes
    * affine-permuted minima. Empty array when the text has < w words. */
  def minHashSig(s: UTF8String, numHashes: Int, w: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    // word start/end byte offsets (single-space separated input)
    var nWords = 0
    var i = 0
    while (i < n) { if (s.getByte(i) == ' ') nWords += 1; i += 1 }
    nWords = if (n == 0) 0 else nWords + 1
    if (nWords < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var wi = 0
    var ws = 0
    i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        starts(wi) = ws; ends(wi) = i; wi += 1; ws = i + 1
      }
      i += 1
    }
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    val mins = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val (a, b) = perm(j); as(j) = a; bs(j) = b; mins(j) = Long.MaxValue
      j += 1
    }
    val nSh = nWords - w + 1
    var sh = 0
    while (sh < nSh) {
      val from = starts(sh)
      val len = ends(sh + w - 1) - from
      val h = java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(base, off + from, len, Seed), P)
      j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      sh += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** 64-bit SimHash: ±1 vote per bit of xxhash64(token) per token
    * occurrence; bit j of the fingerprint = sign of vote j. Returns
    * boxed null when the text has no tokens (matching the pipeline,
    * which drops empty documents before grouping). */
  def simHash64(s: UTF8String): java.lang.Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val votes = new Array[Int](64)
    var any = false
    var ws = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' ') {
        if (i > ws) { // skip empty tokens, as the pipeline's length>0 filter does
          any = true
          val h = XXH64.hashUnsafeBytes(base, off + ws, i - ws, Seed)
          var j = 0
          while (j < 64) {
            votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
        ws = i + 1
      }
      i += 1
    }
    if (!any) return null
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    java.lang.Long.valueOf(fp)
  }

  def minHashSigCol(normText: Column, numHashes: Int = 32, w: Int = 3): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(normText), numHashes, w))

  def simHash64Col(normText: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(normText)))
}

/** array<long> MinHash signature of a normalized document (see
  * [[DedupKernel.minHashSig]]). */
case class MinHashSig(child: Expression, numHashes: Int, w: Int)
    extends UnaryExpression {
  require(numHashes > 0 && w > 0, s"need positive numHashes/w, got $numHashes/$w")

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DedupKernel.minHashSig(input.asInstanceOf[UTF8String], numHashes, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.DedupKernel.minHashSig($c, $numHashes, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of a normalized document; null when the
  * document has no tokens (see [[DedupKernel.simHash64]]). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DedupKernel.simHash64(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long $boxed = graft.expr.DedupKernel.simHash64($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
