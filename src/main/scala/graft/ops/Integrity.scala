package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent table checksums — the replica/migration integrity
  * primitive: two copies of a table (different clusters, different file
  * layouts, different engines) agree iff their checksums agree, without
  * moving either copy. Each row hashes to a 60-bit integer (first 15
  * hex digits of md5 over a '|'-joined column rendering — the same
  * portable device as [[Sampling.hashBucket]]) and the table checksum
  * is the exact DECIMAL sum of row hashes: commutative + associative,
  * so ANY partitioning, row order, or engine produces the identical
  * value. One map-side-combined aggregate per table — checksumming
  * 100 TB is a single scan with 16 bytes of state per partition.
  *
  * Columns must render identically across engines: integers, strings,
  * and DECIMALs are safe; raw DOUBLEs are not (cast them to DECIMAL
  * first) — enforced at the call site by listing columns explicitly. */
object Integrity {

  /** (table_name, n_rows, checksum-as-string) for one table. */
  def tableChecksum(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val rowHash = conv(substring(
        md5(concat_ws("|", cols.map(col): _*)), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.select(rowHash.as("_h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_h")).cast("decimal(38,0)").cast("string").as("checksum"))
      .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
  }
}
