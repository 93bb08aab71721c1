package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the runtime-filter technique for the
  * join regime BETWEEN broadcast and shuffle: the build side's ROWS are
  * too big to broadcast, but its key SET compresses into a few hundred
  * KB of bits. Build a bloom of the build-side keys (one distributed
  * OR-merge aggregation), ship the bitset to every probe task, and drop
  * probe rows map-side BEFORE they are shuffled for the exact join.
  * False positives only cost a little extra shuffle; the exact semi-join
  * after the filter removes them, so the RESULT is identical to the
  * plain join (which is what the q69 oracle checks).
  *
  * At 100 TB: the probe side (lineitem-scale) never shuffles its
  * non-matching majority — the classic 10-100× shuffle reduction of
  * runtime filtering. Spark's own InjectRuntimeFilter makes the same
  * transformation automatically in narrow cases (creation-side
  * thresholds, one filter per query); this operator is the explicit,
  * composable form. Driver state is the bitset itself (numBits/8 bytes
  * — 128 KB at the default 2²⁰ bits), same bounded-collect pattern as
  * the IVF centroids. Size for the BUILD side's distinct-key count
  * (~10 bits/key for ~1% FP): beyond ~10⁸ keys, partition the join and
  * build per-partition blooms instead of growing one bitset.
  *
  * Hashing: double hashing from two splitmix64 lanes — position_i =
  * (h1 + i·h2) mod numBits. Deterministic (no RNG state), so plans and
  * results are stable across runs; the bloom itself needs no external
  * oracle because it never changes the final result.
  */
object BloomJoin {

  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Set key's k bits in the bitset (mutates; aggregation-internal). */
  def set(bits: Array[Long], numBits: Int, k: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L // odd → cycles through all positions
    var i = 0
    while (i < k) {
      val pos = (((h1 + i * h2) % numBits + numBits) % numBits).toInt
      bits(pos >> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Membership test — the probe-side hot path (called from codegen). */
  def test(bits: Array[Long], numBits: Int, k: Int, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val pos = (((h1 + i * h2) % numBits + numBits) % numBits).toInt
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  final case class BloomBuf(bits: Array[Long])

  /** Distributed bloom build: per-partition bitsets OR-merged — state is
    * numBits/8 bytes regardless of row count. */
  class BloomAgg(numBits: Int, k: Int) extends Aggregator[Long, BloomBuf, Array[Long]] {
    require(numBits >= 64 && (numBits & 63) == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(k >= 1, s"need k >= 1 hash functions, got $k")

    override def zero: BloomBuf = BloomBuf(new Array[Long](numBits >> 6))
    override def reduce(b: BloomBuf, key: Long): BloomBuf = {
      set(b.bits, numBits, k, key); b
    }
    override def merge(x: BloomBuf, y: BloomBuf): BloomBuf = {
      var i = 0
      while (i < x.bits.length) { x.bits(i) |= y.bits(i); i += 1 }
      x
    }
    override def finish(b: BloomBuf): Array[Long] = b.bits
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the bitset of a key column (bounded driver collect: one row
    * of numBits/8 bytes). */
  def keyBloom(df: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, k: Int = 5): Array[Long] = {
    val agg = udaf(new BloomAgg(numBits, k))
    df.agg(agg(col(keyCol)).as("bits"))
      .head().getSeq[Long](0).toArray
  }

  /** `might_contain(bits, key)` as a codegen Column. */
  def mightContain(key: Column, bits: Array[Long], numBits: Int, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expr.BloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(key),
        bits.toIndexedSeq, numBits, k))

  /** probe ⋉ build with bloom pre-pruning: map-side drop of probe rows
    * whose key cannot be in build, then the exact LeftSemi join. Result
    * ≡ plain semi-join; shuffle input ≈ matching rows + FP·numBits⁻¹
    * noise instead of the full probe side. */
  def prunedSemiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bits = keyBloom(build, buildKey, numBits, k)
    // resolve the probe key against the pruned probe side, so same-named
    // keys on both sides stay unambiguous
    val pruned = probe.filter(mightContain(col(probeKey), bits, numBits, k))
    pruned.join(build, pruned(probeKey) === build(buildKey), "left_semi")
  }
}
