package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation set (the GPT-3-style overlap check every
  * serious pretraining pipeline runs before training). North-star
  * extension; no counterpart in the reference.
  *
  * Shape at 100 TB: the EVAL side is benchmarks — thousands of documents,
  * millions of n-grams at most — so its distinct n-gram codes are
  * broadcast; the TRAIN side is the corpus, processed map-only (per-doc
  * n-gram codes, [[TextAnalysis.ngramCodes]]) with one groupBy(doc) to
  * count hits. No shuffle carries the corpus text, no join is bigger
  * than corpus-n-grams × broadcast. The n-gram codes are the repo's
  * portable polynomial hashes ([[graft.expr.DedupKernel]] arithmetic),
  * so an external engine — and the DuckDB oracle (q77) — re-derives the
  * identical hit counts.
  */
object Decontaminate {

  /** Distinct n-gram codes of a text column, as one array<long> per row —
    * the one-pass codegen kernel ([[graft.expr.DedupKernel
    * .distinctNgramCodes]]; value-identical to
    * `array_distinct(TextAnalysis.ngramCodes(text, n))`, the interpreted
    * HOF template the oracle mirrors — the kernel took q77 from 4.5s to
    * 0.42s at sf0.1). */
  def ngramSet(text: Column, n: Int): Column =
    graft.expr.DedupKernel.distinctNgramCodesCol(Dedup.normText(text), n)

  /** Distinct n-gram codes of each document, exploded to one row per
    * (id, ngram). */
  def docNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(ngramSet(col(textCol), n)).as("ngram"))

  /** Broadcast ceiling for the eval n-gram set: 10⁷ distinct codes ≈
    * 80 MB of longs on every executor — beyond it the broadcast regime's
    * premise ("eval sets are benchmarks") no longer holds and
    * [[contaminationBloom]] is the right path. */
  val DefaultBroadcastGramLimit: Long = 10000000L

  /** Typed guard failure: the eval set's distinct n-gram count exceeds
    * the broadcast ceiling. Carries both numbers so callers can route to
    * [[contaminationBloom]] (or raise the limit deliberately). */
  final case class EvalGramSetTooLarge(count: Long, limit: Long)
    extends IllegalArgumentException(
      s"eval n-gram set has $count distinct codes, over the broadcast " +
        s"ceiling $limit; use contaminationBloom (bloom-gated exact join) " +
        "or raise maxBroadcastGrams deliberately")

  /** Per-train-document contamination report against `eval`: `n_ngrams`
    * distinct n-grams, `n_hits` of them present anywhere in the eval
    * set, and the hit fraction (exact int/int double). Documents shorter
    * than n tokens carry no n-grams and are excluded (nothing to test).
    *
    * The eval n-gram set is deduplicated then broadcast — the
    * decontamination join never shuffles the corpus. That only works
    * while the eval side stays benchmark-sized, so the gram count is
    * guarded: past `maxBroadcastGrams` this throws
    * [[EvalGramSetTooLarge]] instead of silently OOMing every executor —
    * route those eval sets through [[contaminationBloom]]. */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8,
      maxBroadcastGrams: Long = DefaultBroadcastGramLimit): DataFrame = {
    require(maxBroadcastGrams > 0 && maxBroadcastGrams < Int.MaxValue,
      s"maxBroadcastGrams must be in (0, Int.MaxValue), got $maxBroadcastGrams")
    val evalGrams = eval
      .select(explode(ngramSet(col(textCol), n)).as("ngram"))
      .distinct()
    // ONE execution of the eval-side explode+distinct: pull at most
    // limit+1 codes to the driver (a broadcast materializes the whole
    // set driver-side anyway, so this costs nothing extra), guard, and
    // re-plan the survivors as a local relation — the join then
    // recomputes nothing. The exact over-limit count is only computed
    // on the error path, where the caller wants the number.
    val pulled = evalGrams.limit(maxBroadcastGrams.toInt + 1)
      .collect().map(_.getLong(0))
    if (pulled.length > maxBroadcastGrams)
      throw EvalGramSetTooLarge(evalGrams.count(), maxBroadcastGrams)
    val spark = train.sparkSession
    import spark.implicits._
    val evalGramsLocal = pulled.toSeq.toDF("ngram")
    val base = train
      .select(col(idCol),
        size(ngramSet(col(textCol), n)).cast("long").as("n_ngrams"))
      .filter(col("n_ngrams") > 0)
    val hits = docNgrams(train, idCol, textCol, n)
      .join(broadcast(evalGramsLocal), Seq("ngram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    base.join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("hit_frac", col("n_hits").cast("double") / col("n_ngrams"))
  }

  /** LONGEST CONTIGUOUS overlap runs — the severity readout behind
    * [[contamination]]'s hit COUNT: a doc with 30 scattered 8-gram hits
    * (idioms, boilerplate headers) is a different animal from a doc
    * with 30 CONSECUTIVE hits (a verbatim 37-token quote of a benchmark
    * item — the thing that actually inflates eval numbers, PaLM's
    * "contaminated if a contiguous run" convention). For every
    * contaminated train doc: the number of distinct runs, the longest
    * run in n-gram positions, and its token-span length (run + n − 1).
    *
    * Consecutive POSITIONS: positions p, p+1 both hitting means tokens
    * [p, p+n] all matched, so a maximal run of r consecutive hit
    * positions certifies a verbatim r + n − 1 token overlap. A gap of
    * even one position breaks the run (that n-gram differs → the span
    * is not verbatim). Runs are found with the islands trick — group by
    * pos − rank(pos), pure positional arithmetic, no self-join.
    *
    * Output: (idCol, n_hits, n_runs, max_run, max_token_span), hit docs
    * only (joinable back onto [[contamination]]'s full report).
    *
    * Determinism: positional n-gram codes are the portable polynomial
    * hashes; all run arithmetic is exact integers. Same broadcast
    * ceiling and typed [[EvalGramSetTooLarge]] guard as
    * [[contamination]].
    *
    * Plan: eval grams dedup → driver pull (guarded) → broadcast; corpus
    * side is one map-only posexplode + broadcast semi join (hits only —
    * typically a tiny fraction of corpus positions), one per-doc window
    * over the HIT positions, two grouped aggregates. The corpus text
    * never shuffles; the window partitions by doc id over hits only. */
  def contaminationRuns(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8,
      maxBroadcastGrams: Long = DefaultBroadcastGramLimit): DataFrame = {
    require(maxBroadcastGrams > 0 && maxBroadcastGrams < Int.MaxValue,
      s"maxBroadcastGrams must be in (0, Int.MaxValue), got $maxBroadcastGrams")
    val evalGrams = eval
      .select(explode(ngramSet(col(textCol), n)).as("ngram"))
      .distinct()
    val pulled = evalGrams.limit(maxBroadcastGrams.toInt + 1)
      .collect().map(_.getLong(0))
    if (pulled.length > maxBroadcastGrams)
      throw EvalGramSetTooLarge(evalGrams.count(), maxBroadcastGrams)
    val spark = train.sparkSession
    import spark.implicits._
    val evalGramsLocal = pulled.toSeq.toDF("ngram")
    // codegen positional kernel, NOT the HOF ngramCodes template: the
    // HOF chain interprets n-1 zip_with lambdas per element, which at
    // n=8 over a corpus posexplode dominated the query (6s -> sub-s at
    // sf0.1, the same swap that fixed q77). Kernel ≡ template is
    // spec-proven (DedupExprsSpec) and the oracle replays the template.
    val pos = train.select(col(idCol),
        posexplode(graft.expr.DedupKernel.allNgramCodesCol(
          Dedup.normText(col(textCol)), n)))
      .select(col(idCol), col("pos"), col("col").as("ngram"))
    val hits = pos.join(broadcast(evalGramsLocal), Seq("ngram"))
      .select(col(idCol), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val runs = hits
      .withColumn("_grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("_grp"))
      .agg(count(lit(1)).as("_run"))
    runs.groupBy(col(idCol))
      .agg(sum(col("_run")).as("n_hits"),
        count(lit(1)).as("n_runs"),
        max(col("_run")).as("max_run"))
      .withColumn("max_token_span", col("max_run") + lit(n - 1).cast("long"))
  }

  /** Contamination SOURCE attribution: for every train document sharing
    * at least one n-gram with the eval set, the single eval document it
    * shares the most distinct n-grams with (ties → smallest eval id) and
    * that shared-gram count — the "which benchmark leaked" report that
    * turns a decontamination flag into an actionable finding.
    *
    * Same broadcast regime as [[contamination]], with per-eval-doc
    * attribution: the (eval id, gram) pairs are pulled driver-side in
    * ONE job (guarded by the same ceiling — pairs, not just distinct
    * grams, since that is what broadcasts) and re-planned as a local
    * relation; the corpus side is map-only n-gram explode → broadcast
    * join → one groupBy((train, eval)) bounded by actual overlaps, then
    * a max_by per train doc. No shuffle carries corpus text. */
  def contaminationSources(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8,
      maxBroadcastGrams: Long = DefaultBroadcastGramLimit): DataFrame = {
    require(maxBroadcastGrams > 0 && maxBroadcastGrams < Int.MaxValue,
      s"maxBroadcastGrams must be in (0, Int.MaxValue), got $maxBroadcastGrams")
    val evalPairs = eval
      .select(col(idCol).as("eval_id"),
        explode(ngramSet(col(textCol), n)).as("ngram"))
    val pulled = evalPairs.limit(maxBroadcastGrams.toInt + 1).collect()
    if (pulled.length > maxBroadcastGrams)
      throw EvalGramSetTooLarge(evalPairs.count(), maxBroadcastGrams)
    val spark = train.sparkSession
    val evalLocal = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(pulled.toSeq).asJava,
      evalPairs.schema)
    docNgrams(train, idCol, textCol, n)
      .join(broadcast(evalLocal), Seq("ngram"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("eval_id"), col("n_shared")),
        struct(col("n_shared"), -col("eval_id"))).as("_top"))
      .select(col(idCol), col("_top.eval_id").as("eval_id"),
        col("_top.n_shared").as("n_shared"))
  }

  /** [[contamination]] for eval sets BEYOND broadcast scale: instead of
    * shipping the gram set, ship a bloom of it (numBits/8 bytes — 128 KB
    * at the default — regardless of gram count, [[BloomJoin.keyBloom]]),
    * drop corpus n-grams map-side through the bloom, and resolve the
    * survivors with an exact shuffle equi-join against the eval grams.
    * False positives are removed by the exact join, so the report is
    * IDENTICAL to [[contamination]] (spec-proven); the shuffle carries
    * only true hits plus the FP rate × corpus grams, not the corpus. */
  def contaminationBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8,
      numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val evalGrams = eval
      .select(explode(ngramSet(col(textCol), n)).as("ngram"))
      .distinct()
    val bits = BloomJoin.keyBloom(evalGrams, "ngram", numBits, k)
    val base = train
      .select(col(idCol),
        size(ngramSet(col(textCol), n)).cast("long").as("n_ngrams"))
      .filter(col("n_ngrams") > 0)
    val hits = docNgrams(train, idCol, textCol, n)
      .filter(BloomJoin.mightContain(col("ngram"), bits, numBits, k))
      .join(evalGrams, Seq("ngram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    base.join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("hit_frac", col("n_hits").cast("double") / col("n_ngrams"))
  }

  /** A precomputed eval n-gram set: the codes AND the n they were built
    * with, bundled so a gate can never probe with a mismatched n-gram
    * size (5-gram codes vs 8-gram codes share essentially no hash
    * values — a silent always-pass). Seq, not Array, so the case class
    * keeps structural equality (arrays compare by reference). */
  final case class EvalGrams(n: Int, grams: Seq[Long])

  /** The eval set's distinct n-gram codes as a driver value — the static
    * side of the STREAMING gate. Eval sets are benchmarks (thousands of
    * docs, ~10⁵-10⁶ grams), so driver/plan state is bounded by design;
    * a corpus-sized right side belongs in the batch [[contamination]]
    * path instead. */
  def evalGramSet(eval: DataFrame, textCol: String, n: Int = 8): EvalGrams =
    EvalGrams(n,
      eval.select(explode(ngramSet(col(textCol), n)).as("ngram"))
        .distinct()
        .collect().map(_.getLong(0)).sorted.toSeq)

  /** Streaming decontamination gate: drop incoming documents that share
    * any word n-gram with the (static, precomputed) eval gram set —
    * decontaminate-on-ingest, so leaked eval content never lands in the
    * corpus. The n-gram size travels WITH the gram set ([[EvalGrams]]).
    * Map-only per micro-batch (kernel + codegen arrays_overlap against
    * the literal gram set): no stream-stream join, no state store,
    * works under any trigger/watermark. Compose before
    * [[graft.streaming.CollectionIngest.appendStream]]. */
  def streamGate(docsStream: DataFrame, textCol: String,
      evalGrams: EvalGrams): DataFrame =
    docsStream.filter(!arrays_overlap(
      ngramSet(col(textCol), evalGrams.n),
      lit(evalGrams.grams.toArray)))

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram overlap check: flag corpus vectors whose rounded cosine to
    * ANY eval-set vector reaches `threshold` (paraphrased or lightly
    * rewritten benchmark leakage that shares no 8-gram but lands next to
    * the eval item in embedding space). Returns one row per flagged
    * corpus id: (idCol, eval_id, cos_sim) with eval_id the closest eval
    * vector (ties → smallest id).
    *
    * Same regime as [[contamination]]: the EVAL side is benchmarks —
    * bounded by construction and ENFORCED by `maxEvalVectors`, checked
    * ON the broadcast collect itself (the mmrRerank limit-probe idiom:
    * collect maxEvalVectors + 1 rows, fail typed if the probe row
    * appears — no separate count job, and violation is a typed error,
    * not an executor OOM). Plan: ONE broadcast cross join (corpus ×
    * evals, the q118 margin-mining shape) with the threshold filter
    * applied BEFORE the per-corpus-row argmax, so the rank exchange
    * carries only flagged rows; the argmax plans as WindowGroupLimit.
    * The corpus never shuffles its vectors — only (id, eval_id, cos)
    * survivors move. */
  def semanticFlags(corpus: DataFrame, evals: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      maxEvalVectors: Int = 100000): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0,
      s"threshold must be a cosine in (-1, 1], got $threshold")
    require(maxEvalVectors > 0, s"maxEvalVectors must be positive")
    val reserved = Seq("eval_id", "cos_sim", "__graft_ev", "__graft_rn")
    require(!reserved.contains(idCol) && !reserved.contains(vecCol),
      s"id/vector column may not use the reserved names $reserved")
    val ePlan = evals.select(col(idCol).as("eval_id"), col(vecCol).as("__graft_ev"))
    // the collect IS the guard: one job materializes the broadcast rows
    // and proves the bound at the same time
    val eRows = ePlan.limit(maxEvalVectors + 1).collect()
    require(eRows.length <= maxEvalVectors,
      s"eval set exceeds maxEvalVectors = $maxEvalVectors — the broadcast " +
        "regime's premise (eval sets are benchmarks) no longer holds")
    val e = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(eRows: _*), ePlan.schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("cos_sim").desc, col("eval_id").asc)
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(e))
      .withColumn("cos_sim",
        round(graft.expr.VectorExprs.cosine(col(vecCol), col("__graft_ev")), 6))
      .filter(col("cos_sim") >= threshold)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .select(col(idCol), col("eval_id"), col("cos_sim"))
  }
}
