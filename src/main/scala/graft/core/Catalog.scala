package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One collection's catalog entry — the Spark-native form of the
  * reference's `KeyViewIndexer` + `key-{view}` pointer scheme
  * (reference: src/embeddings.rs:127-142, 481-539; src/database.rs:13-15).
  */
final case class CollectionInfo(
    view: String,
    key: String,
    path: String,
    modelType: String,
    dim: Int,
    createdAt: Long)

/** The collections catalog: a tiny Parquet table under
  * `{warehouse}/_catalog` mapping view → (key, data path, model config).
  *
  * The reference keeps three LMDB keys ("keys", "views", "key-{view}") that
  * it read-modify-writes on every mutation (embeddings.rs:481-539); here
  * that collapses into a single small table rewritten atomically
  * (write-new-then-swap) on add/remove. At 100 TB the catalog stays tiny
  * (one row per collection) — only collection *data* scales.
  */
final class Catalog(spark: SparkSession, warehouse: String) {
  import spark.implicits._

  private val catalogPath = s"$warehouse/_catalog"

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists: Boolean = fs.exists(new Path(catalogPath))

  def list(): Seq[CollectionInfo] =
    if (!exists) Seq.empty
    else spark.read.parquet(catalogPath).as[CollectionInfo].collect().toSeq
      .sortBy(_.view)

  def listDf(): DataFrame =
    if (!exists) spark.emptyDataset[CollectionInfo].toDF()
    else spark.read.parquet(catalogPath)

  /** All view names (reference: fetch_collection_keys(views=true),
    * embeddings.rs:312-324). */
  def views(): Seq[String] = list().map(_.view)

  /** All collection keys (reference: fetch_collection_keys(views=false)). */
  def keys(): Seq[String] = list().map(_.key)

  def find(view: String): Option[CollectionInfo] = list().find(_.view == view)

  def findByKey(key: String): Option[CollectionInfo] = list().find(_.key == key)

  def add(info: CollectionInfo): Unit = {
    val current = list()
    if (current.exists(_.view == info.view)) throw DuplicateView(info.view)
    write(current :+ info)
  }

  def remove(view: String): Unit = {
    val current = list()
    if (!current.exists(_.view == view)) throw ViewNotFound(view)
    write(current.filterNot(_.view == view))
  }

  private def write(rows: Seq[CollectionInfo]): Unit = {
    // tiny table: write to a fresh dir, then swap — readers never see a
    // half-written catalog (the reference's read-modify-write of its LMDB
    // index lists has the same races single-threaded-only, SURVEY.md §3.4)
    val tmp = new Path(catalogPath + ".tmp")
    val dst = new Path(catalogPath)
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }
}
