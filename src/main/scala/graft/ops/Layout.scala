package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators — the file-skipping lever at
  * 100 TB (north-star extension; the reference stores one opaque blob and
  * has no layout concept at all, database.rs:169-194).
  *
  * A single-column sort key gives parquet min/max pruning on ONE
  * predicate column only; queries filtering the second column read
  * everything. The Z-order (Morton) curve interleaves the bits of two
  * keys, so range-partitioning by the z-value yields files whose min/max
  * envelopes are TIGHT IN BOTH dimensions — scans with a predicate on
  * either column (or both) skip most files. Pure integer bit arithmetic,
  * expression-only (codegen), deterministic, and replayable by any engine
  * with shift/and — which is what lets the DuckDB oracle recompute the
  * curve exactly (q80).
  */
object Layout {

  /** Raise a frame's partition count to the session's default parallelism
    * when the source supplies fewer splits than cores — the parallelism
    * floor for FLOPS-BOUND broadcast products (all-pairs similarity, k-NN
    * graphs): a corpus that arrives as one parquet row group would
    * otherwise generate the whole O(n·m) product inside ONE task while
    * every other core idles (guide §2.6 — stragglers / idle capacity).
    * At scale the scan already has ≥ cores splits and this is the
    * identity — the repartition (a round-robin exchange of the small
    * side's rows, NEVER of the product) only fires when the input is
    * narrower than the machine, so the production plan is untouched.
    * Row-content no-op: partitioning moves rows, not values.
    *
    * RESTRICTION (r17, advisor note): the input must be EXCHANGE-FREE
    * (a bare scan/projection). The split count comes from `df.rdd`, and
    * with AQE enabled accessing `.rdd` on a plan containing exchanges
    * eagerly EXECUTES its shuffle stages at plan-construction time —
    * fine for the scan-only call sites this utility serves, wrong for
    * anything downstream of a shuffle. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Morton (Z-order) interleave of two non-negative integer columns,
    * `bits` low bits each: result bit 2i = bit i of x, bit 2i+1 = bit i
    * of y. Inputs must already be bounded to `bits` bits (mask or bucket
    * them first — at scale the bucketing IS the resolution knob: 16 bits
    * per dimension ≈ 4 G cells, far finer than any file count). */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits per dimension must be 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce[Column](_.bitwiseOR(_))
  }

  /** Write `df` Z-ordered on two bounded integer expressions: range-
    * partition by the z-value into `numFiles` output files and sort rows
    * within each file, so every file owns a compact z-range — a compact
    * rectangle-ish region in (x, y) space — and parquet min/max stats
    * prune on BOTH columns. One range-exchange (sampled bounds), the
    * standard price of any clustered write; rewriting layout is a batch
    * maintenance op, not a per-query cost. */
  def zorderWrite(df: DataFrame, x: Column, y: Column, bits: Int,
      path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("_z", zValue2(x, y, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998) — the placement rule whose rebalancing cost is
    * MINIMAL by construction: adding shard N+1 moves only the ~1∕(N+1)
    * of keys whose HRW hash is highest on the NEW shard; nothing else
    * reshuffles (unlike mod-N, which moves almost everything).
    *
    * weight(key, shard) = first 8 md5 hex digits of "key:shard" (the
    * repo's portable hash device); the assignment is the shard with the
    * max weight, ties by smallest shard id. One explode over N shards +
    * a per-key argmax — map-side work proportional to N·rows with no
    * data-dependent state; N is a config constant. */
  def rendezvousShard(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"need at least one shard, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_hw").desc, col("shard"))
    df.select(col(idCol),
        explode(expr(s"sequence(0, ${numShards - 1})")).as("shard"))
      .withColumn("_hw", conv(substring(
        md5(concat_ws(":", col(idCol), col("shard"))), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("shard").cast("long").as("shard"))
  }
}
