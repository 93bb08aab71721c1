package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
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
    createdAt: Long,
    partitionCols: Seq[String] = Seq.empty)

/** The collections catalog: a tiny Parquet table under
  * `{warehouse}/_catalog` mapping view → (key, data path, model config).
  *
  * The reference keeps three LMDB keys ("keys", "views", "key-{view}") that
  * it read-modify-writes on every mutation (embeddings.rs:481-539); here
  * that collapses into one small table, made reader-safe with a versioned
  * layout: each write lands in a fresh `v_{nonce}` directory and a CURRENT
  * pointer file is swapped over it with an atomic OVERWRITE rename —
  * readers always resolve a complete version, never a half-written or
  * momentarily-deleted directory. At 100 TB the catalog stays tiny (one
  * row per collection) — only collection *data* scales. (Concurrent
  * *writers* still need external coordination — same single-writer model
  * as the reference's lock, database.rs:28-31.)
  */
final class Catalog(spark: SparkSession, warehouse: String) {
  import spark.implicits._

  private val catalogPath = s"$warehouse/_catalog"
  private val currentPtr = new Path(s"$catalogPath/CURRENT")

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve the current version's data dir via the pointer file. */
  private def currentDir(): Option[String] = {
    if (!fs.exists(currentPtr)) return None
    val in = fs.open(currentPtr)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      Some(s"$catalogPath/${new String(bytes, StandardCharsets.UTF_8).trim}")
    } finally in.close()
  }

  /** Forward-compatible read of a catalog version dir: columns added to
    * CollectionInfo after a warehouse was written (e.g. partitionCols)
    * are filled with their defaults — encoder resolution alone would
    * throw on the missing column and brick every pre-existing warehouse. */
  private def readVersion(dir: String): DataFrame = {
    val raw = spark.read.parquet(dir)
    val withPartitionCols =
      if (raw.columns.contains("partitionCols")) raw
      else raw.withColumn("partitionCols",
        org.apache.spark.sql.functions.typedLit(Seq.empty[String]))
    withPartitionCols
  }

  def list(): Seq[CollectionInfo] = currentDir() match {
    case None => Seq.empty
    case Some(dir) =>
      readVersion(dir).as[CollectionInfo].collect().toSeq.sortBy(_.view)
  }

  def listDf(): DataFrame = currentDir() match {
    case None => spark.emptyDataset[CollectionInfo].toDF()
    case Some(dir) => readVersion(dir)
  }

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

  /** Replace an existing entry (same view) — e.g. after compaction moves
    * the collection's data path. */
  def update(info: CollectionInfo): Unit = {
    val current = list()
    if (!current.exists(_.view == info.view)) throw ViewNotFound(info.view)
    write(current.filterNot(_.view == info.view) :+ info)
  }

  private def write(rows: Seq[CollectionInfo]): Unit = {
    val prev = currentDir()
    val version = s"v_${System.nanoTime()}"
    spark.createDataset(rows).coalesce(1).write.mode("overwrite")
      .parquet(s"$catalogPath/$version")
    // atomic pointer swap (FileContext rename with OVERWRITE — atomic on
    // posix-local and HDFS): readers see either the old or the new version
    val tmp = new Path(s"$catalogPath/CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(StandardCharsets.UTF_8)) finally out.close()
    FileContext.getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, currentPtr, Options.Rename.OVERWRITE)
    // best-effort cleanup: keep current + immediately-previous version (an
    // in-flight reader may have resolved the old pointer); drop older ones
    val keep = Set(Some(s"$catalogPath/$version"), prev).flatten
      .map(p => new Path(p).getName)
    try {
      fs.listStatus(new Path(catalogPath)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v_") && !keep.contains(n)) fs.delete(st.getPath, true)
      }
    } catch { case _: Exception => () }
  }
}
