package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.LongType
import scala.collection.mutable

/** Exact heavy hitters at stream scale — every item occurring at least
  * `minCount` times, with its EXACT count, found without ever shuffling
  * the distinct-item space.
  *
  * The scale problem with the obvious `groupBy(item).count().filter`:
  * the shuffle carries one row per DISTINCT item (at 100 TB an n-gram
  * or URL space easily exceeds cluster memory), even though the answer
  * is a handful of rows. The classic two-pass fix (Cormode-Muthukrishnan
  * Count-Min + candidate verification):
  *
  *  1. ONE map-only pass builds a Count-Min sketch — depth × width long
  *     counters, integer additions, so partials merge associatively and
  *     the sketch is bit-identical under any partitioning. State is
  *     depth × width longs per partition partial, INDEPENDENT of item
  *     cardinality.
  *  2. ONE map-only pass counts EXACTLY only the items whose sketch
  *     estimate reaches `minCount`. CMS never under-counts, so that
  *     candidate set is a SUPERSET of the true heavy hitters; per-item
  *     state is bounded by true hitters (≤ rows/minCount) plus the
  *     sketch's false positives (tunable via width — ε ≈ e/width of the
  *     row count leaks through per hash row).
  *
  * The exact second-pass counts then discard every false positive, so
  * the result equals the plain exact aggregate — the DuckDB oracle
  * (q113) runs `GROUP BY HAVING count >= τ` with NO sketch replay and
  * must hash-match: correctness is independent of the hash family by
  * construction (the same one-sided-error device as the bloom-gated
  * decontamination join, q112).
  *
  * Both passes run over the plan's InternalRow output (no per-row
  * allocation) and tree-combine with [[ExactRank]]'s adaptive depth
  * rationale. Driver state: the sketch + the candidate map, both
  * guarded. */
object HeavyHitters {

  /** Count-Min sketch: `counters(i)` is row i of the depth × width
    * grid; the estimate of an item is the MIN over rows of its counter
    * (each row over-counts by collisions, never under-counts). */
  final case class Sketch(width: Int, counters: Array[Array[Long]]) {
    def depth: Int = counters.length
    def estimate(x: Long): Long = {
      var m = Long.MaxValue
      var i = 0
      while (i < counters.length) {
        val c = counters(i)(bucket(x, i, width))
        if (c < m) m = c
        i += 1
      }
      m
    }
  }

  /** Row-i bucket of item x: splitmix64-style finalizer over x ⊕ seed_i
    * — full-avalanche integer mixing, portable to any engine (pure
    * long arithmetic), no Random anywhere. */
  private[ops] def bucket(x: Long, i: Int, width: Int): Int = {
    var z = x + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (((z % width) + width) % width).toInt
  }

  /** Ceiling on the exact-verify candidate map (per partial AND on the
    * driver): ~16M entries ≈ 256 MB worst case. Exceeding it means
    * minCount/width are mis-sized for the data (the candidate set must
    * be answer-sized, not data-sized) — fail fast, never OOM. */
  val maxCandidates: Int = 16 << 20

  private def longRows(df: DataFrame) = {
    val fields = df.schema.fields
    require(fields.length == 1 && fields(0).dataType == LongType,
      s"need a single long item column, got ${df.schema.simpleString}")
    df.queryExecution.toRdd
  }

  private def treeDepth(rdd: org.apache.spark.rdd.RDD[_]): Int =
    if (rdd.getNumPartitions <= 64) 1 else 2

  /** Pass 1: the Count-Min sketch of `items` (single long column). */
  def sketch(items: DataFrame, depth: Int = 4, width: Int = 8192): Sketch = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 16, s"width must be >= 16: $width")
    val rows = longRows(items)
    val agg = rows.treeAggregate(Array.empty[Array[Long]])(
      seqOp = (acc0, row) => {
        if (row.isNullAt(0)) acc0
        else {
          val acc = if (acc0.length == 0)
            Array.fill(depth)(new Array[Long](width)) else acc0
          val x = row.getLong(0)
          var i = 0
          while (i < depth) {
            acc(i)(bucket(x, i, width)) += 1
            i += 1
          }
          acc
        }
      },
      combOp = (l, r) => {
        if (l.length == 0) r
        else if (r.length == 0) l
        else {
          var i = 0
          while (i < l.length) {
            val li = l(i); val ri = r(i)
            var b = 0
            while (b < li.length) { li(b) += ri(b); b += 1 }
            i += 1
          }
          l
        }
      },
      depth = treeDepth(rows))
    Sketch(width,
      if (agg.length == 0) Array.fill(depth)(new Array[Long](width)) else agg)
  }

  /** Both passes: every item with exact count ≥ `minCount`, as
    * (item, n). The result is EXACT — identical to
    * `groupBy(item).count.filter(_ >= minCount)` — but the shuffle-free
    * passes keep state answer-sized instead of distinct-item-sized. */
  def heavyHitters(items: DataFrame, itemCol: String, minCount: Long,
      depth: Int = 4, width: Int = 8192): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val spark = items.sparkSession
    val projected = items.select(
      org.apache.spark.sql.functions.col(itemCol).cast("long").as("item"))
    val sk = sketch(projected, depth, width)
    val bc = spark.sparkContext.broadcast(sk)
    val rows = longRows(projected)
    val counts = rows.treeAggregate(mutable.HashMap.empty[Long, Long])(
      seqOp = (acc, row) => {
        if (!row.isNullAt(0)) {
          val x = row.getLong(0)
          if (bc.value.estimate(x) >= minCount) {
            acc.update(x, acc.getOrElse(x, 0L) + 1L)
            require(acc.size <= maxCandidates,
              s"CMS candidate set exceeded $maxCandidates entries — " +
                s"width $width is undersized for minCount $minCount at this " +
                "data volume; widen the sketch or raise the threshold")
          }
        }
        acc
      },
      combOp = (l, r) => {
        r.foreach { case (x, c) => l.update(x, l.getOrElse(x, 0L) + c) }
        require(l.size <= maxCandidates,
          s"CMS candidate set exceeded $maxCandidates entries on merge")
        l
      },
      depth = treeDepth(rows))
    bc.destroy()
    val hits = counts.iterator
      .filter { case (_, n) => n >= minCount }
      .map { case (x, n) => org.apache.spark.sql.Row(x, n) }
      .toSeq
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(hits).asJava,
      StructType(Seq(StructField(itemCol, LongType), StructField("n", LongType))))
  }
}
