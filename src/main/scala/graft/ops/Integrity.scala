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
  * first) — enforced at the call site by listing columns explicitly.
  *
  * The row rendering is INJECTIVE, not just a join: a naive
  * `concat_ws('|', ...)` skips NULLs entirely — ('a', NULL, 'b') and
  * ('a', 'b', NULL) render identically — and a value containing the
  * delimiter aliases column boundaries (('a|b','c') vs ('a','b|c')),
  * so two genuinely different replicas could produce EQUAL checksums.
  * Each column is therefore escaped ('\' → '\\', '|' → '\|') and NULL
  * is rendered as the tag '\N', which no escaped value can collide
  * with — all literal left-to-right replaces, replayed identically by
  * the DuckDB oracle. */
object Integrity {

  /** (table_name, n_rows, checksum-as-string) for one table. */
  def tableChecksum(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val rendered = cols.map { c =>
      coalesce(
        call_function("replace",
          call_function("replace", col(c).cast("string"),
            lit("\\"), lit("\\\\")),
          lit("|"), lit("\\|")),
        lit("\\N"))
    }
    val rowHash = conv(substring(
        md5(concat_ws("|", rendered: _*)), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.select(rowHash.as("_h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_h")).cast("decimal(38,0)").cast("string").as("checksum"))
      .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
  }
}
