package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SCALE.md): when one key
  * carries a disproportionate share of rows (a viral user_id, an empty-
  * string document), hash-partitioning sends it all to one task. AQE's
  * skew-join split handles sort-merge cases at runtime; salting is the
  * deterministic, plan-level fix that also covers aggregations.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random-but-
    * deterministic salt in [0, salts); the small side is replicated once
    * per salt value via explode. The join key becomes (key, salt), so a
    * hot key spreads over `salts` tasks. Row-level results are identical
    * to the unsalted join.
    *
    * Determinism: salt = hash of the large side's full row id expression,
    * not rand() — reruns and retries produce the same partitioning.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val saltedLarge = large.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-safe equi-join of a large stream against its own Zipf-skewed
    * lookup table (the LM-scoring shape: corpus-derived (group, token, n)
    * rows joined back to a vocabulary-sized count table, where one hot
    * token like "the" is a double-digit percent of the corpus and would
    * land on ONE shuffle task).
    *
    * Plan: the top `hotK` lookup rows by `weight` (deterministic
    * tie-break on the key columns) are broadcast and map-side joined —
    * the skewed keys BY CONSTRUCTION sit in this set, so the large side
    * never hash-partitions on them; only rows whose key falls outside
    * the hot set shuffle-join against the residual lookup, and that tail
    * is near-uniform by Zipf's law.
    *
    * `joinType` "inner" (default) drops left keys absent from `lookup`
    * (vacuous for self-derived count tables, where every key is present
    * by construction); "left" keeps them with NULL payload — the
    * held-out-scoring case, where unseen n-grams must survive into a
    * backoff chain.
    *
    * Row-level results are identical to `left.join(lookup, keys,
    * joinType)` UNCONDITIONALLY — including lookups with duplicate join
    * keys: the hot set is KEY-COMPLETE by construction (the top `hotK`
    * distinct keys ranked by max(weight), then every lookup row for
    * those keys), so a key's rows can never straddle the hot/cold
    * boundary and silently drop matches. For the common unique-key count
    * table this selects exactly the old top-hotK rows; for duplicated
    * keys the broadcast carries up to hotK × (max rows per key) rows —
    * `weight` must be usable inside max() over lookup rows. The routing
    * never changes a value, so oracle hashes survive the swap.
    *
    * Cost note: the lookup is referenced three times (key ranking, hot
    * selection, cold join), so it is materialized HERE once with a
    * lazy localCheckpoint — the first reference computes it, the other
    * two read the cached partitions; without this, an un-checkpointed
    * corpus-derived lookup lineage (a token count table is a full
    * corpus explode + groupBy) would re-run per reference. Lookups are
    * vocabulary-sized by contract, so the cached copy is model-sized. */
  def hotColdJoin(
      left: DataFrame, lookup: DataFrame, keys: Seq[String],
      weight: Column, hotK: Int, joinType: String = "inner"): DataFrame = {
    require(hotK > 0, s"hotK must be positive: $hotK")
    require(joinType == "inner" || joinType == "left",
      s"hotColdJoin supports inner/left, got $joinType")
    require(!left.columns.contains("__graft_hot") &&
        !lookup.columns.contains("__graft_hot"),
      "hotColdJoin reserves the working column name __graft_hot")
    val lkp = lookup.localCheckpoint(eager = false)
    // top hotK KEYS by max row weight (deterministic tie-break on the
    // keys) — a map-side-combined vocab-sized aggregate + TakeOrdered
    val hotKeys = lkp
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max(weight).as("__graft_w"))
      .orderBy(col("__graft_w").desc +: keys.map(k => col(k).asc): _*)
      .limit(hotK)
      .select(keys.map(col).toIndexedSeq: _*)
    val hot = lkp.join(broadcast(hotKeys), keys.toIndexedSeq)
    val tagged = left.join(
      broadcast(hot.withColumn("__graft_hot", lit(1))), keys.toIndexedSeq, "left")
    val fromHot = tagged.filter(col("__graft_hot").isNotNull).drop("__graft_hot")
    val coldLeft = tagged.filter(col("__graft_hot").isNull)
      .select(left.columns.map(col).toIndexedSeq: _*)
    // the cold rows' keys are disjoint from the hot KEY set by
    // construction, so joining the FULL lookup is row-identical to
    // joining (lookup ∖ hot) — no anti-join needed; the hot rows it
    // carries match nothing
    fromHot.unionByName(coldLeft.join(lkp, keys.toIndexedSeq, joinType))
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Use for
    * algebraic aggregates (sum/count/min/max). */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String, salts: Int,
      saltBy: Column): DataFrame =
    df.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))
}
