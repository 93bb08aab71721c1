package graft.ops

import graft.expr.VectorExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path for similarity search next to SRP-LSH ([[Similarity]]): a coarse
  * k-means quantizer partitions the corpus into `nc` cells; a query probes
  * only its `nprobe` nearest cells, so pairwise work drops from N to
  * ~N·nprobe/nc, and a corpus *partitioned/bucketed by cell* turns the
  * probe into partition pruning before the scan.
  *
  * Everything is deterministic (seeded init, fixed iteration count,
  * lexicographic tie-breaks) and expression-based:
  *  - assignment = argmin over per-centroid L2 kernels via `least()` on
  *    (distance, index) structs — map-only, codegen'd, no shuffle;
  *  - training shuffles only nc × dim doubles per Lloyd round (the
  *    [[graft.expr.CentroidAggregator]] sketch property);
  *  - probing computes each query's nprobe nearest cells with
  *    sort_array over the same struct trick — map-only on the (small,
  *    broadcast) query side.
  *
  * Centroids live on the driver (nc × dim floats — an index parameter,
  * not data; 4096 × 1024 ≈ 16 MB at the top end), mirroring how IVF
  * coarse quantizers ship with the index in any ANN system.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Float]]) {
    def nc: Int = centroids.length
    require(centroids.nonEmpty, "IVF model needs at least one centroid")
  }

  /** Unit-normalized copy of a float-vector column (spherical k-means:
    * the re-rank metric is cosine, so cells must quantize direction, not
    * magnitude — L2 on unit vectors is a monotone function of cosine).
    * Zero vectors pass through unchanged. */
  def unit(vec: Column): Column = {
    val n = sqrt(VectorExprs.dot(vec, vec))
    when(n === 0d, vec)
      .otherwise(transform(vec, x => (x / n).cast("float")))
  }

  /** (distance, cellIdx) struct per centroid; least()/sort_array pick the
    * argmin lexicographically — distance first, index breaks exact ties. */
  private def distStructs(vec: Column, m: IvfModel): Seq[Column] =
    m.centroids.zipWithIndex.toSeq.map { case (c, i) =>
      struct(VectorExprs.l2(unit(vec), lit(c)).as("d"), lit(i).as("i"))
    }

  /** Nearest-centroid cell id, as a map-only codegen expression. */
  def cellOf(vec: Column, m: IvfModel): Column = {
    val ds = distStructs(vec, m)
    (if (ds.size == 1) ds.head else least(ds: _*)).getField("i")
  }

  /** The query's `nprobe` nearest cells as an array<int>. */
  def probeCells(vec: Column, m: IvfModel, nprobe: Int): Column = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    transform(
      slice(sort_array(array(distStructs(vec, m): _*)), 1, math.min(nprobe, m.nc)),
      s => s.getField("i"))
  }

  /** Deterministic k-means training: init = the `nc` vectors with the
    * smallest xxhash64(id, seed) (a seeded pseudo-random sample that is
    * independent of partition layout), then `iters` Lloyd rounds. Each
    * round is one map-only assignment plus a groupBy(cell) centroid
    * aggregation that shuffles nc × dim doubles total. Cells that lose
    * all members keep their previous centroid. */
  def train(df: DataFrame, idCol: String, vecCol: String,
      nc: Int, iters: Int = 2, seed: Long = 42L): IvfModel = {
    require(nc >= 1, s"need nc >= 1, got $nc")
    // train in unit space (spherical k-means): centroids quantize
    // direction, matching the cosine re-rank metric
    val init = df
      .select(unit(col(vecCol)).as("_uv"), xxhash64(col(idCol), lit(seed)).as("_h"))
      .orderBy(col("_h"))
      .limit(nc)
      .select(col("_uv"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(init.length == nc,
      s"corpus has only ${init.length} rows for nc = $nc centroids")
    var model = IvfModel(init)
    val centroidOf = udaf(new graft.expr.CentroidAggregator(init.head.length))
    var it = 0
    while (it < iters) {
      val next = df
        .select(cellOf(col(vecCol), model).as("_cell"), unit(col(vecCol)).as("_uv"))
        .groupBy(col("_cell"))
        .agg(centroidOf(col("_uv")).as("_c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
        .toMap
      model = IvfModel(Array.tabulate(nc)(i => next.getOrElse(i, model.centroids(i))))
      it += 1
    }
    model
  }

  /** Add the `ivf_cell` assignment column — map-only; write the result
    * partitioned/bucketed by ivf_cell to make probes prune partitions. */
  def assign(df: DataFrame, vecCol: String, m: IvfModel): DataFrame =
    df.withColumn("ivf_cell", cellOf(col(vecCol), m))

  /** Approximate top-k: each query probes its `nprobe` nearest cells;
    * candidates in those cells are re-ranked by exact cosine. Equi-join
    * on the cell id with the (small) probe side broadcast — never a
    * cross join; the per-query candidate set is ~N·nprobe/nc. Schemas:
    * queries (q_id, qv), candidates (n_id, nv). */
  def topK(queries: DataFrame, candidates: DataFrame, m: IvfModel,
      k: Int, nprobe: Int = 2): DataFrame = {
    val probes = queries
      .select(col("q_id"), col("qv"),
        explode(probeCells(col("qv"), m, nprobe)).as("ivf_cell"))
    val cands = assign(candidates, "nv", m)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    cands.join(broadcast(probes), Seq("ivf_cell"))
      .withColumn("sim", VectorExprs.cosine(col("nv"), col("qv")))
      .select(col("q_id"), col("n_id"), col("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
