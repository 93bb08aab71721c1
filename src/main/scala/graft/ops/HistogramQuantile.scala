package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate quantiles from a fixed-width histogram — the mergeable,
  * engine-portable alternative to t-digest/GK sketches (whose state is
  * engine-private, like HLL's): per group, values are binned into
  * `bins` equal-width buckets over the group's [min, max]; the q-th
  * quantile is linearly interpolated inside the bucket where the
  * cumulative count crosses ceil(q·n).
  *
  * Two aggregation passes (extent, then bin counts — both partial+final
  * map-side-combined shuffles on the group key) and a vocabulary-sized
  * window over (group × bins) rows. At 100 TB: state per group is
  * `bins` longs — bounded and mergeable like every sketch here — and
  * no pass sorts or collects values. Error ≤ bucket width, i.e.
  * (max−min)/bins.
  *
  * Portability: binning is floor((v−min)/(max−min)·bins) with doubles
  * from exact inputs; the interpolation is one divide/multiply/add —
  * all IEEE-identical in any engine, so the q75 DuckDB oracle replays
  * the sketch bit-for-bit (6-dp rounding on the output only).
  */
object HistogramQuantile {

  /** One row per (group, requested q): approximate quantile estimates.
    * Output: groupCol, p (the quantile), est (rounded 6dp), n. */
  def quantiles(df: DataFrame, groupCol: String, valCol: String,
      qs: Seq[Double], bins: Int = 128): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(qs.nonEmpty && qs.forall(p => p > 0.0 && p <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val g = col(groupCol)
    val v = col(valCol).cast("double")

    val extent = df.groupBy(g)
      .agg(min(v).as("_lo"), max(v).as("_hi"), count(v).as("_n"))

    // degenerate groups (all one value) put everything in bin 0;
    // nulls are excluded on BOTH passes (count(v) already skips them)
    val binned = df.select(g, v.as("_v"))
      .filter(col("_v").isNotNull)
      .join(extent, groupCol)
      .withColumn("_bin",
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_lo")) / (col("_hi") - col("_lo")) * bins),
            lit(bins - 1).cast("long")).cast("long")))
      .groupBy(g, col("_lo"), col("_hi"), col("_n"), col("_bin"))
      .agg(count(lit(1)).as("_c"))

    val w = Window.partitionBy(g).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = binned.withColumn("_cumBefore", coalesce(sum(col("_c")).over(w), lit(0L)))

    // ONE plan branch for all requested quantiles: explode the (tiny)
    // quantile list against the (group × bins) rows and keep the row
    // whose cumulative count crosses rank ceil(p·n) — identical math to
    // a per-p filter, without q plan branches each re-walking the
    // histogram lineage (at 9 deciles that was 9 unioned subtrees)
    cum
      .select(col("*"), explode(array(qs.map(lit): _*)).as("p"))
      .withColumn("_needed", ceil(col("p") * col("_n")).cast("long"))
      .filter(col("_cumBefore") < col("_needed") &&
        col("_needed") <= col("_cumBefore") + col("_c"))
      .withColumn("_width", (col("_hi") - col("_lo")) / bins)
      .withColumn("est", round(
        when(col("_hi") === col("_lo"), col("_lo")).otherwise(
          col("_lo") + col("_width") *
            (col("_bin") +
              (col("_needed") - col("_cumBefore")).cast("double") / col("_c"))),
        6))
      .select(g, col("p"), col("est"), col("_n").as("n"))
  }
}
