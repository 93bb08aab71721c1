package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT per-group order statistics WITHOUT a per-group sort — the
  * scale-safe replacement for `row_number() OVER (PARTITION BY g ORDER BY
  * v)` when g has few distinct values. The window form funnels each
  * group's entire row set through ONE reducer task (a 3-value group key
  * makes the engine a three-task sort with unbounded per-task memory);
  * this op never sorts and never shuffles the base data at all.
  *
  * Method (iterative histogram selection, the classic distributed
  * selection algorithm — e.g. Blum et al. selection generalized to
  * scan-counting): each (group, rank) target keeps a candidate value
  * range [lo, hi]. Per round, one MAP-ONLY pass over the base data
  * counts rows into ≤ `buckets` equal-width slots of each target's
  * range (broadcast join against the tiny target-state table; the only
  * shuffle is the partial-count aggregate, ≤ targets × buckets rows).
  * The driver walks the cumulative counts to find the slot containing
  * the rank, narrows the range to it, and repeats; when slot width
  * reaches 1, the slot IS the value. Rounds ≤ ⌈log_buckets(range)⌉
  * (≤ 5 for any 64-bit domain at the default 8192), so a 100 TB input
  * is scanned a bounded handful of times with pushed filters and
  * column pruning, with combiner-friendly aggregation and zero data
  * skew sensitivity.
  *
  * Driver state is bounded by targets × buckets longs — the same
  * bounded-collect regime as [[Ivf.probeIndex]]'s probed cell ids,
  * NOT a data-proportional collect. Intended for LOW-cardinality
  * groups (the regime where the window plan is a scale-killer); for
  * high-cardinality groups the per-partition window sort is already
  * fine and preferable.
  *
  * All arithmetic is integer (values enter as exact fixed-point longs),
  * so the selected statistic is bit-identical to what any engine's sort
  * would return — the DuckDB oracles replay the same ranks against a
  * plain sorted scan and hash-match (q98/q109).
  */
object ExactRank {

  /** One selection target: the `rank`-th smallest (1-based) value of
    * `group`'s multiset, labeled `name` in the output. */
  final case class RankTarget(group: String, name: String, rank: Long)

  private final case class TargetState(group: String, name: String,
      lo: Long, hi: Long, r: Long, var done: Boolean = false)

  /** Exact values at per-group ranks over `df` = (groupCol: string,
    * centsCol: long). `rankOf` maps each group's row count n to the
    * 1-based ranks wanted for that group (name -> rank). Returns one row
    * per group with a long value column per rank name, e.g.
    * (l_returnflag, p05_cents, p95_cents). */
  def valuesAtRanks(s: SparkSession, df: DataFrame, groupCol: String,
      centsCol: String, rankOf: Long => Seq[(String, Long)],
      buckets: Int = 8192): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val base = df.select(col(groupCol).cast("string").as("g"),
      col(centsCol).cast("long").as("c"))

    // one aggregate for per-group n / min / max — groups are
    // low-cardinality by contract, so this result is a bounded scalar set
    val bounds = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("lo"), max(col("c")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    var states: Seq[TargetState] = bounds.toSeq.flatMap { case (g, n, lo, hi) =>
      rankOf(n).map { case (name, rank) =>
        require(rank >= 1 && rank <= n, s"rank $rank outside 1..$n for group $g")
        val st = TargetState(g, name, lo, hi, rank)
        if (lo == hi) { st.done = true }
        st
      }
    }
    val rankNames = states.map(_.name).distinct

    while (states.exists(!_.done)) {
      val open = states.filter(!_.done)
      // width per target this round: ceil(range / buckets), floor 1
      val widths = open.map { st =>
        val range = st.hi - st.lo + 1
        st -> math.max(1L, (range + buckets - 1) / buckets)
      }
      val stateRows = widths.map { case (st, w) =>
        Row(st.group, st.name, st.lo, st.hi, w)
      }
      val stateSchema = StructType(Seq(
        StructField("g", StringType), StructField("nm", StringType),
        StructField("lo", LongType), StructField("hi", LongType),
        StructField("w", LongType)))
      val stateDf = s.createDataFrame(
        s.sparkContext.parallelize(stateRows.toList, 1), stateSchema)
      // map-only pass: broadcast the target states, bucket each in-range
      // row, partial+final count — the ONLY shuffle is targets×buckets
      // partial counts, never base rows
      val hist = base
        .join(broadcast(stateDf), Seq("g"))
        .filter(col("c") >= col("lo") && col("c") <= col("hi"))
        .groupBy(col("g"), col("nm"),
          expr("(c - lo) div w").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .groupBy(t => (t._1, t._2))

      states = states.map { st =>
        if (st.done) st
        else {
          val w = widths.find(_._1 eq st).get._2
          val slots = hist.getOrElse((st.group, st.name), Array.empty)
            .map(t => t._3 -> t._4).sortBy(_._1)
          var cum = 0L
          var b = -1L
          var below = 0L
          var i = 0
          while (b < 0 && i < slots.length) {
            val (slot, cnt) = slots(i)
            if (cum + cnt >= st.r) { b = slot; below = cum }
            cum += cnt
            i += 1
          }
          require(b >= 0, s"rank ${st.r} not reached in ${st.group}/${st.name}")
          if (w == 1L) TargetState(st.group, st.name,
            st.lo + b, st.lo + b, 1L, done = true)
          else {
            val nlo = st.lo + b * w
            val nhi = math.min(st.hi, nlo + w - 1)
            TargetState(st.group, st.name, nlo, nhi, st.r - below)
          }
        }
      }
    }

    // pivot driver-side: one row per group, a long column per rank name
    val byGroup = states.groupBy(_.group)
    val outRows = byGroup.toSeq.sortBy(_._1).map { case (g, sts) =>
      val vals = sts.map(st => st.name -> st.lo).toMap
      Row.fromSeq(g +: rankNames.map(vals(_)))
    }
    val outSchema = StructType(
      StructField(groupCol, StringType) +:
        rankNames.map(n => StructField(n, LongType)))
    s.createDataFrame(s.sparkContext.parallelize(outRows.toList, 1), outSchema)
  }
}
