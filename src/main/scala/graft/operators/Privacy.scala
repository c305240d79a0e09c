package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every training-data
  * pipeline runs before a corpus ships (emails, IPv4 addresses, phone
  * numbers; reference anchor: the curation mandate in `BASELINE.json`
  * north_star). Pure `regexp_replace`/`regexp_count` Column
  * expressions — codegen'd, no UDF, so the scrub rides whole-stage
  * codegen over the text column and scales as a narrow map (zero
  * exchanges; at 100 TB the cost is the scan itself).
  *
  * Patterns are deliberately restricted to the RE2 ∩ java.util.regex
  * common subset (character classes, bounded quantifiers, `\b` over
  * ASCII word chars; no lookaround, no backreferences) so the SAME
  * pattern string replays in engines on either library — the DuckDB
  * oracle for q140/q141 runs these patterns verbatim. */
object Privacy {

  /** local-part@domain.tld — no lookaround, longest-match greedy on
    * both engines. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like `1.2.3.4.5`
    * still match only a 4-octet prefix window consistently on both
    * engines. */
  val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** NNN-NNN-NNNN (US-style dashed), word-bounded. */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** 16-digit card-number CANDIDATE (word-bounded run) — reportable
    * PII only after the Luhn checksum validates it (q191's gate). */
  val CardPattern = "\\b[0-9]{16}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken    = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Redact in FIXED order email → IPv4 → phone (the order is part of
    * the contract: an email whose domain is a dotted quad is consumed
    * whole by the email pass, so the later passes see only what the
    * earlier ones left). */
  def scrubCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** `textCol` redacted in place. */
  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, scrubCol(col(textCol)))

  /** Per-row match counts (`n_email`, `n_ip`, `n_phone`) computed on
    * the UNREDACTED text — the detection report that decides whether a
    * document is dropped, scrubbed, or passed. Pattern strings go in as
    * Column literals, NEVER through a SQL string literal (whose escape
    * processing would eat the `\b`/`\d` backslashes). */
  def stats(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_email", regexp_count(col(textCol), lit(EmailPattern)))
    .withColumn("n_ip", regexp_count(col(textCol), lit(Ipv4Pattern)))
    .withColumn("n_phone", regexp_count(col(textCol), lit(PhonePattern)))
}
