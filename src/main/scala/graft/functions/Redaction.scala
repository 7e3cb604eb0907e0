package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora — the redaction pass a large-scale
  * text pipeline runs between curation and tokenization (emails, phone
  * numbers, IP addresses → typed placeholder tokens).
  *
  * Patterns are deliberately lookaround-free and class-explicit so the Java
  * regex engine (Spark, codegen'd `regexp_replace`) and RE2 (the DuckDB
  * oracle) parse them identically — the same portability rule as q60's
  * BPE pre-tokenizer. Replacement order matters: emails first (their local
  * part may embed digits/dots that the narrower patterns would chew up),
  * then IPs (dotted digits), then phones (dashed digits) — the three
  * classes are disjoint after that ordering.
  *
  * Per-row scalar pipeline: no shuffle, no UDF; at 100 TB each parquet
  * split scrubs independently inside whole-stage codegen.
  */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Number of matches of `re` in `c` (BIGINT-pinned for oracle parity). */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  def redactEmails(c: Column): Column = regexp_replace(c, EmailRe, "[EMAIL]")
  def redactIps(c: Column): Column = regexp_replace(c, Ipv4Re, "[IP]")
  def redactPhones(c: Column): Column = regexp_replace(c, PhoneRe, "[PHONE]")

  /** Full scrub: emails → IPs → phones (see ordering note above). */
  def redactPii(c: Column): Column =
    redactPhones(redactIps(redactEmails(c)))
}
