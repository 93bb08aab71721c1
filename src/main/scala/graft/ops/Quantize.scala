package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) vector quantization for similarity search — the memory
  * layout that makes 100 TB of float32 embeddings a 25 TB scan.
  *
  * Per-vector symmetric quantization: scale = 127 / max|xᵢ| (1.0 for the
  * zero vector), qᵢ = round(xᵢ·scale) ∈ [-127, 127]. Cosine is invariant
  * under per-vector scaling, so approximate cosine needs NO
  * dequantization: cos_q = Σqₐq_b / (√Σqₐ² · √Σq_b²) — integer sums
  * ([[graft.expr.Int8Dot]], codegen) with one double divide at the end.
  * Search = int8 scan top-k candidates → exact float rerank of the
  * survivors (the standard recall-preserving two-phase shape, same as
  * the LSH/IVF paths).
  *
  * Everything is portable arithmetic — round() ties-away-from-zero,
  * IEEE double divide/sqrt of exact integers — so external engines
  * replay quantization, scores, and the candidate cut bit-for-bit
  * (q70's DuckDB oracle does).
  *
  * Quantization itself runs once at index-build time (HOF transforms are
  * fine there); the per-query hot path is the codegen integer kernel.
  */
object Quantize {

  /** max |xᵢ| of a float vector, in double. */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** 127 / max|x|, or 1.0 for the zero vector. */
  def int8Scale(vec: Column): Column = {
    val mx = absMax(vec)
    when(mx > 0.0d, lit(127.0d) / mx).otherwise(lit(1.0d))
  }

  /** The quantized vector: round(xᵢ · scale) as array<tinyint>. */
  def toInt8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("byte"))

  /** Σ qᵢ² of a quantized vector (long — exact). */
  def norm2(q: Column): Column =
    aggregate(q, lit(0L), (acc, x) => acc + x.cast("long") * x.cast("long"))

  /** Adds `q8` (array<tinyint>), `q_scale` (double) and `q_norm2` (long)
    * — the index-build projection to persist alongside (or instead of)
    * the float vectors. */
  def withInt8(df: DataFrame, vecCol: String): DataFrame = {
    val sc = int8Scale(col(vecCol))
    df.withColumn("q_scale", sc)
      .withColumn("q8", toInt8(col(vecCol), col("q_scale")))
      .withColumn("q_norm2", norm2(col("q8")))
  }

  /** Approximate cosine from quantized vectors + precomputed norms:
    * double division of exact integers; 0.0 when either norm is zero. */
  def cosI8(qa: Column, qb: Column, na2: Column, nb2: Column): Column = {
    val prod = na2 * nb2
    when(prod > 0L,
      graft.expr.QuantExprs.dotI8(qa, qb).cast("double") /
        sqrt(prod.cast("double")))
      .otherwise(lit(0.0d))
  }

  /** 1-bit (binary) quantization: the sign bits of the vector packed
    * into 32-bit lanes (array<long>, lane l bit j = sign of dimension
    * 32l+j) — the most aggressive storage tier: a 64-dim float vector
    * becomes TWO words (32× smaller than float32, 8× smaller than
    * int8). Hamming distance between sign sketches approximates angle —
    * the SRP-LSH estimator with the identity basis — so candidates =
    * smallest-Hamming scan, then exact rerank. Pure comparisons and bit
    * ops: any engine replays it bit-for-bit. 32-bit lanes keep every
    * intermediate far from signed-64 overflow (ANSI-safe in Spark,
    * BIGINT-safe in DuckDB). */
  def signBits(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"sign sketch needs >= 1 dim, got $dim")
    val lanes = (0 until (dim + 31) / 32).map { l =>
      val hi = math.min(dim, 32 * (l + 1)) // fold lane dims high→low:
      // acc·2 + sign-bit ≡ Σ bit_j << j (variable shifts aren't
      // expressible in the column DSL)
      aggregate(sequence(lit(hi), lit(32 * l + 1), lit(-1)), lit(0L),
        (acc, i) => acc * 2L + when(element_at(vec, i) > lit(0f), 1L).otherwise(0L))
    }
    array(lanes: _*)
  }

  /** Hamming distance between two sign sketches (lane-wise popcount). */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  // ---- product quantization (Jégou et al. 2011, "Product Quantization
  // for Nearest Neighbor Search") -----------------------------------------

  /** One PQ sub-codebook per subspace: plain-L2 k-means
    * ([[Ivf.train]] with normalize=false) on the m-th `subDim`-slice of
    * the vectors, with a per-subspace seed so codebooks initialize
    * independently. Deterministic and engine-portable like the coarse
    * IVF quantizer — the oracle replays ALL subspace trainings. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      numSub: Int, subDim: Int, ks: Int, iters: Int = 2,
      seed: Long = 42L): Array[Ivf.IvfModel] =
    Array.tabulate(numSub) { m =>
      Ivf.train(
        df.select(col(idCol).as("id"),
          slice(col(vecCol), m * subDim + 1, subDim).as("v")),
        "id", "v", nc = ks, iters = iters, seed = seed + 100L * m,
        normalize = false)
    }

  /** (distance-to-chosen-centroid, code) struct for subspace `m` of
    * `vec` — the argmin over the sub-codebook with index tie-break,
    * exactly [[Ivf.cellOfUnit]]'s lexicographic least() on raw slices. */
  private def subCode(vec: Column, model: Ivf.IvfModel,
      m: Int, subDim: Int): Column = {
    val sub = slice(vec, m * subDim + 1, subDim)
    val ds = model.centroids.zipWithIndex.toSeq.map { case (c, i) =>
      struct(graft.expr.VectorExprs.l2(sub, lit(c)).as("d"), lit(i).as("i"))
    }
    (if (ds.size == 1) ds.head else least(ds: _*)).getField("i")
  }

  /** PQ-encode: one tinyint-range code per subspace, as array<int>.
    * Map-only; at rest this is numSub bytes per vector instead of
    * 4·dim — the 64-dim float corpus compresses 128×. */
  def pqCodes(vec: Column, models: Seq[Ivf.IvfModel], subDim: Int): Column =
    array(models.zipWithIndex.map { case (mod, m) =>
      subCode(vec, mod, m, subDim)
    }: _*)

  /** Asymmetric-distance (ADC) approximation for a query literal against
    * a codes column: Σ over subspaces of the L2 distance between the
    * query's m-th slice and the centroid selected by code m. (Distances,
    * not squared distances, are summed — sqrt-form L2 is the arithmetic
    * every engine reproduces bit-for-bit from the same integers, which
    * keeps the oracle exact; the ranking quality of the approximation is
    * spec-checked against exact search.) The centroid lookup is
    * element_at on a literal array-of-arrays — map-only codegen, no join
    * against a codebook table. */
  def adc(queryVec: Seq[Float], codesCol: Column,
      models: Seq[Ivf.IvfModel], subDim: Int): Column =
    adcCol(lit(queryVec.toArray), codesCol, models, subDim)

  /** ADC with the query as a COLUMN (for joined probe×candidate rows —
    * the IVF∘PQ composition, q107): per subspace, slice the query column
    * and measure against the literal-codebook centroid the code selects. */
  def adcCol(queryCol: Column, codesCol: Column,
      models: Seq[Ivf.IvfModel], subDim: Int): Column =
    models.zipWithIndex.map { case (mod, m) =>
      val centArr = array(mod.centroids.map(c => lit(c)).toIndexedSeq: _*)
      graft.expr.VectorExprs.l2(
        slice(queryCol, m * subDim + 1, subDim),
        element_at(centArr, element_at(codesCol, m + 1) + 1))
    }.reduce[Column](_ + _)
}
