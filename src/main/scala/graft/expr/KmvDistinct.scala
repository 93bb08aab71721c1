package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch — the ORACLE-CHECKABLE
  * sibling of approx_count_distinct: where HLL register layouts are
  * engine-private by design, KMV's state is just the k smallest DISTINCT
  * portable hashes of the values seen, and its estimator is one integer
  * division — so an external engine replays the whole sketch exactly
  * (q49's DuckDB oracle recomputes hashes, k-th minimum and estimate
  * bit-for-bit).
  *
  * h(key) = ((key mod P)·a + b) mod P with (a, b) = DedupKernel.perm(0) —
  * the same affine family the MinHash oracle inlines; all arithmetic
  * stays below 2⁶².
  *
  * Estimator: with the k-th smallest of n ≥ k distinct uniform hashes at
  * v_k, density ≈ k/v_k, so distinct ≈ (k−1)·P / v_k (the classic
  * unbiased KMV form), floored by integer division — identical in any
  * engine. When fewer than k distinct hashes exist the sketch IS the
  * distinct set and the count is exact.
  *
  * State is a sorted array of ≤ k longs: bounded, associative,
  * commutative, duplicate-insensitive — the properties that make it a
  * mergeable distributed sketch (partial aggregation, streaming state,
  * index-time precompute all work).
  */
final case class KmvBuf(hs: Array[Long])

class KmvDistinct(k: Int) extends Aggregator[Long, KmvBuf, Long] {
  require(k >= 2, s"KMV needs k >= 2, got $k")
  private val P = DedupKernel.P
  private val (a, b) = DedupKernel.perm(0)

  @inline private def hash(key: Long): Long =
    (java.lang.Math.floorMod(key, P) * a + b) % P

  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  /** Insert into the sorted ≤k buffer iff absent and small enough. */
  private def insert(hs: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(hs, h)
    if (pos >= 0) return hs // already present (duplicate-insensitive)
    if (hs.length >= k && h > hs(hs.length - 1)) return hs // too large
    val ip = -pos - 1
    val n = math.min(hs.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(hs, 0, out, 0, ip)
    out(ip) = h
    System.arraycopy(hs, ip, out, ip + 1, n - ip - 1)
    out
  }

  override def reduce(buf: KmvBuf, key: Long): KmvBuf =
    KmvBuf(insert(buf.hs, hash(key)))

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    // merge two sorted distinct arrays, keep the k smallest
    val out = new Array[Long](math.min(x.hs.length + y.hs.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.hs.length || j < y.hs.length)) {
      val takeX = j >= y.hs.length ||
        (i < x.hs.length && x.hs(i) <= y.hs(j))
      val v = if (takeX) { val v = x.hs(i); i += 1; v }
              else { val v = y.hs(j); j += 1; v }
      if (i < x.hs.length && x.hs(i) == v) i += 1 // cross-side duplicate
      if (j < y.hs.length && y.hs(j) == v) j += 1
      out(o) = v; o += 1
    }
    KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }

  override def finish(buf: KmvBuf): Long =
    if (buf.hs.length < k) buf.hs.length.toLong
    else (k - 1).toLong * P / buf.hs(k - 1)

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
