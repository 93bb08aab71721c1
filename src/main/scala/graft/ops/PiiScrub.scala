package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus curation (north-star extension,
  * SURVEY.md §2.3 "Text analysis"): find-and-replace of email addresses,
  * IPv4 addresses, and dashed phone numbers, with per-category match
  * counts for audit.
  *
  * Expression-only (`regexp_extract_all` / `regexp_replace` — codegen'd,
  * fused into the scan): at 100 TB this is a map-only projection, no
  * shuffle, no UDF. The patterns deliberately use only the regex subset
  * with identical semantics in Java's engine and RE2-style engines
  * (character classes, bounded repetition, `\b`) so external oracles
  * replay redaction byte-for-byte — same portability rule as the sketch
  * kernels (DedupKernel).
  *
  * Counts are taken on the ORIGINAL text; redaction applies email →
  * phone → IPv4 (the patterns are mutually non-overlapping, so order
  * only matters for reading the code, not the result).
  */
object PiiScrub {

  /** user@host.tld — local part then a dotted domain with an alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: fields up to 3 digits). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Dashed phone in the 25-989-741-2988 shape (TPC-H c_phone format). */
  val PhoneRe = "\\b[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

  def matchCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redacted text: each match replaced by its category tag. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRe, "<PHONE>")
    regexp_replace(noPhone, Ipv4Re, "<IP>")
  }

  /** id, redacted text, and per-category counts for every row. */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      matchCount(t, EmailRe).as("n_emails"),
      matchCount(t, Ipv4Re).as("n_ips"),
      matchCount(t, PhoneRe).as("n_phones"),
      redact(t).as("redacted"))
  }
}
