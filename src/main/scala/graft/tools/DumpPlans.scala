package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dev tool: regenerate PLANS.md — formatted physical plans for the
  * plan-shape-critical queries, as evidence for the scale claims in
  * SCALE.md. Run: sbt "runMain graft.tools.DumpPlans /root/testdata/sf0.01"
  */
object DumpPlans {
  val showcased = Seq(
    "q01_pricing_summary"  -> "partial+final hash agg, DECIMAL-exact, pushdown",
    "q02_revenue_by_nation" -> "star join: every dim broadcast, fact never shuffles pre-agg",
    "q03_topk_orders"      -> "global top-k = TakeOrderedAndProject (no sort)",
    "q04_window_rank"      -> "per-group top-k = WindowGroupLimit (bounded heap, partial+final)",
    "q20_vec_dot_topk"     -> "codegen vector kernel fused over the scan + broadcast query vector",
    "q24_meta_filter_cosine" -> "metadata DSL pushed to the parquet scan (PushedFilters)",
    "q30_dedup_exact"      -> "fingerprint groupBy: map-side combine, single shuffle",
    "q32_minhash_lsh"      -> "MinHash signatures + LSH band equi-join (no cross join)",
    "q17_sessionization"   -> "gap sessionization: one user_id exchange shared by lag/cumsum windows + agg; NTZ-armored ts scan keeps pushdown",
    "q58_range_frame"      -> "RANGE (value-based) window frame over unix_micros; single hash exchange",
    "q18_asof_join"        -> "as-of join as union + last-over-window (no range-join explosion)",
    "q35_ann_lsh"          -> "SRP-LSH: integer bucket bits fused in codegen, candidate equi-join on (table, bucket)",
    "q53_range_join"       -> "range join as bucketed equi-join + exact filter (no per-key cartesian)",
    "q65_incremental_dedup" -> "batch×corpus candidates via (band,bucket) equi-join — no corpus recompute",
    "q67_repetition"       -> "one-pass codegen repetition kernel, map-only scan",
    "q68_stratified_sample" -> "per-group quota: one hash exchange + WindowGroupLimit",
    "q69_bloom_semijoin"   -> "bloom runtime filter fused into the probe scan before the exact semi-join",
    "q77_decontaminate"    -> "eval n-grams broadcast: the corpus never shuffles for the probe join",
    "q80_zorder_layout"    -> "Morton key is a map-only codegen projection + one partial+final agg",
    "q82_bm25_topk"        -> "tf restricted to query terms BEFORE the aggregate; df/stats broadcast",
    "q94_semdedup"         -> "SemDeDup: within-cell pairs via equi-join on the k-means cell, never a cross product",
    "q97_prefix_jaccard"   -> "PPJoin prefix filter: candidates from the rare-prefix code equi-join; exact verify only on candidates",
    "q99_pq_adc"           -> "PQ ADC: literal-codebook expression over the coded corpus — no join, floats never scanned",
    "q101_attribution"     -> "last-touch: one window pass carries the channel; no event self-join",
    "q107_ivf_pq"          -> "IVF-PQ serving stack: partition-pruned index scan, codebook-literal ADC, bounded rerank",
    "q108_pagerank"        -> "integer PageRank: equi-join + combiner groupBy per iteration, lazy lineage for shallow runs",
    "q112_decontaminate_bloom" -> "bloom gate fused map-side before the exact survivor join — corpus never shuffles",
    "q114_contamination_source" -> "eval (doc, gram) pairs as a broadcast local relation; overlap groupBy bounded by hits; max_by argmax",
    "q115_token_drift"     -> "two vocab-sized map-side-combined counts, full-outer equi-join, 1-row totals broadcast",
    "q116_weighted_reservoir" -> "A-ES weighted sample: map-only key projection into TakeOrderedAndProject (no global sort)",
    "q117_dsir_selection"  -> "DSIR: one explode builds both LM count tables; vocab joins; bounded top-50",
    "q118_margin_mining"   -> "margin kNN: broadcast cross join + WindowGroupLimit heap prunes for both neighborhood sums",
    "q119_span_removal"    -> "span removal: (long,long) gram shuffles only; text never crosses an exchange",
    "q124_quality_classifier" -> "quality filter: one-pass feature kernel, O(buckets) model table broadcast, one doc-keyed agg",
    "q126_phash_neardup"   -> "phash media dedup: codegen fingerprint (payloads never shuffle), band equi-join, Hamming verify before distinct",
    "q129_source_cap"      -> "per-domain cap: rank filter compiles to WindowGroupLimit — partial top-k per partition before the exchange",
    "q131_zipf_slope"      -> "zipf fit: (lang, tk) explode into map-side-combined counts; regression sums over the vocab-sized frame only",
    "q125_doremi_mixture"  -> "DoReMi weights: (domain, token, n) pre-aggregate, hot tokens BROADCAST via hotColdJoin — the corpus never hash-partitions on the zipf-skewed token key",
    "q78_unigram_logprob"  -> "unigram LM scoring: doc-keyed pre-aggregate + hot/cold vocab join (broadcast head, shuffled near-uniform tail)",
    "q143_scd2_merge"      -> "SCD2: ONE full-outer join of the open slice vs the deduped batch; history untouched, all routing map-only",
    "q150_rendezvous_shards" -> "rendezvous sharding: per-partition WindowGroupLimit argmax before the exchange — no all-shards fan-out survives",
    "q155_semantic_decon"  -> "semantic decontamination: eval vectors broadcast, threshold filter BEFORE the bounded-heap argmax — corpus vectors never shuffle",
    "q157_kn_bigram"       -> "Kneser-Ney LM: (doc, p, c, n) pre-aggregate + hot/cold pair join — the q102 skew-safe shape with continuation counts",
    "q159_char_entropy"    -> "char entropy: pure map-only nested HOF — zero shuffle, no join, no aggregate",
    "q162_shard_prep"      -> "shard prep: gate → dedup → pack composed in ONE plan; packing is a per-shard windowed prefix sum, never a global sort",
    "q164_triplet_mining"  -> "triplet mining: band-join positives × broadcast negative pool → bounded-heap argmin — pairs × pool, never pairs × corpus",
    "q161_windowed_quantiles" -> "windowed percentiles: one partial+final bin-count aggregate + (window × type × bins)-sized windows",
    "q163_semantic_outliers" -> "semantic outliers: broadcast centroid table + WindowGroupLimit argmax — corpus vectors never shuffle",
    "q167_backoff_trigram" -> "stupid-backoff LM: per-branch micro-scores precomputed on vocab-sized model tables — THREE hot/cold corpus joins (one per n-gram order), was five",
    "q168_lm_index_score"  -> "LM serving: persisted tri/bi/uni deltas re-aggregated + the q167 three-join probe — the training corpus appears nowhere in the plan",
    "q172_components_append" -> "incremental components: affected-cluster star edges ∪ new pairs re-solved, untouched labels pass through — (id, label)-sized state only",
    "q174_pca_project" -> "PCA projection: eigenvectors as literals in ONE map-only corpus pass — exact-long dots, DECIMAL norms, TakeOrderedAndProject top-N, no join",
    "q225_contamination_runs" -> "contamination runs: codegen positional n-gram kernel + broadcast eval-gram semi join — corpus text never shuffles; the window runs over HIT positions only",
    "q227_textrank" -> "TextRank: corpus bigram explode collapses to the vocabulary-edge graph via DISTINCT before any PageRank round touches it",
    "q229_gate_plan" -> "gate planner: ONE map-only pass to a single row of conditional aggregates — the corpus is never shuffled at all",
    "q234_bpe_persisted" -> "persisted tokenizer serving: merge table read from the manifest, vocab-sized fold + hotColdJoin word lookup — training appears nowhere in the plan",
    "q252_isotropy" -> "isotropy canary: corpus posexplode collapses to a dims-sized grid (map-side combined) before the two quadratic forms — the all-pairs cosine with no pair join",
    "q262_skew_report" -> "skew report: ONE map-side-combined key count + top-k TakeOrderedAndProject — the report costs a scan, never a sort",
    "q266_cosine_tf" -> "AllPairs cosine: prefix-token equi-join gated by two integer Cauchy-Schwarz bounds, then a candidate-linear verify join — the brute-force cross product appears nowhere")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local()
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by graft.tools.DumpPlans)\n\n")
    sb.append(s"Formatted plans at `$sfDir`, backing the shuffle/broadcast/pushdown\n")
    sb.append("claims in SCALE.md. Regenerate after plan-affecting changes.\n")
    for ((name, why) <- showcased) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $why\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${showcased.size} plans)")
    spark.stop()
  }
}
