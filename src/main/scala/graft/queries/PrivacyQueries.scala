package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Privacy

/** Round-7 privacy faces — the PII scrub every corpus runs before it
  * ships ([[Privacy]]):
  *
  *  - q140: per-document detection counts + redacted-text digest
  *  - q141: per-source audit rollup (docs carrying PII, totals by kind)
  *
  * The synthetic corpus carries no organic PII, so both queries plant
  * it DETERMINISTICALLY inside the query (doc_id-derived email/IP/phone
  * appended to residue classes 3/5/7 — docs outside a class keep their
  * text byte-identical, so the scrub's no-op path is exercised too).
  * The construction is replayed verbatim in the DuckDB oracle; the
  * patterns are the [[Privacy]] constants, which live in the
  * RE2 ∩ java.util.regex common subset precisely so one pattern string
  * serves both engines. Scrub + count are narrow codegen'd maps — the
  * per-doc query's only exchange is the output sort, the audit's its
  * group-sized rollup. */
object PrivacyQueries {

  /** Deterministic PII planting (shared by q140/q141; mirrored in the
    * oracle CTE): email on doc_id%3=0, dotted-quad on %5=0, dashed
    * phone on %7=0. */
  private def synthDocs(s: SparkSession, d: String): DataFrame =
    // scan-parallelism floor (round 19, guide §2.5): the three
    // regex-count/replace maps ran as single ~0.33 s tasks at sf0.1
    // (twice under the contract sort's range sampling); self-disabling
    // at real volumes
    graft.Tables.withParallelismFloor(documents(s, d), "doc_id")
      .select(col("doc_id"), col("source"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(""),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
            lit(".0.1"))).otherwise(""),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise("")).as("text"))

  /** q140: detection counts on the raw text + md5 of the redacted text
    * per document. */
  def q140(s: SparkSession, d: String): DataFrame =
    Privacy.scrub(Privacy.stats(synthDocs(s, d), "text"), "text")
      .select(col("doc_id"),
        col("n_email").cast("long").as("n_email"),
        col("n_ip").cast("long").as("n_ip"),
        col("n_phone").cast("long").as("n_phone"),
        md5(col("text")).as("scrub_md5"))
      .orderBy("doc_id")

  /** q141: the shippability audit — per source, how many documents
    * carry any PII and the totals by kind. */
  def q141(s: SparkSession, d: String): DataFrame =
    Privacy.stats(synthDocs(s, d), "text")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_email") > 0 || col("n_ip") > 0 ||
          col("n_phone") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
        sum(col("n_email").cast("long")).as("total_email"),
        sum(col("n_ip").cast("long")).as("total_ip"),
        sum(col("n_phone").cast("long")).as("total_phone"))
      .orderBy("source")

  /** The Luhn contribution sum over the first `n` digits of a digit
    * string referenced by `ref`, laid out as the LEFT prefix of a
    * 16-digit card: from the right of the full card, every second
    * digit doubles (9-wrapped), which for length 16 is every ODD
    * 1-indexed left position. Pure SQL (CASE + substr + aggregate-HOF),
    * identical text on both engines apart from the fold builtin —
    * `mkLuhn` renders the Spark face (`aggregate`), the oracle renders
    * DuckDB's (`list_sum(list_transform(...))`). */
  private def luhnTerm(ref: String): String =
    s"""CASE WHEN i % 2 = 1
       |  THEN CASE WHEN 2 * CAST(substr($ref, i, 1) AS INT) > 9
       |    THEN 2 * CAST(substr($ref, i, 1) AS INT) - 9
       |    ELSE 2 * CAST(substr($ref, i, 1) AS INT) END
       |  ELSE CAST(substr($ref, i, 1) AS INT) END""".stripMargin

  /** q191 credit-card (PAN) detection with Luhn validation — the PII
    * kind q140's battery misses: a 16-digit run is only reportable PII
    * when its Luhn checksum holds (the false-positive gate every DLP
    * scrubber applies — order ids and hashes fail it 90% of the time).
    *
    * Planting (mirrored verbatim in the oracle): docs with doc_id%4=0
    * get a 16-digit number appended whose first 15 digits derive from
    * doc_id; the check digit is Luhn-CORRECT when doc_id%8=0 and
    * off-by-5 otherwise — so exactly half the planted runs must
    * validate, and the detector is graded on telling them apart.
    * Candidates come from the word-bounded 16-digit regex (RE2 ∩
    * java.util.regex, q140's rule); each is validated by the in-plan
    * Luhn fold. Everything is a narrow codegen'd map — the only
    * exchange is the output sort. */
  def q191(s: SparkSession, d: String): DataFrame = {
    val withText = documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        expr("""lpad(CAST((doc_id * 7919) % 1000000000000000 AS STRING),
               |     15, '0')""".stripMargin).as("d15"))
      .withColumn("sum15",
        expr(s"""aggregate(sequence(1, 15), 0,
                |  (acc, i) -> acc + ${luhnTerm("d15")})""".stripMargin))
      .withColumn("card",
        concat(col("d15"),
          when(col("doc_id") % 8 === 0,
            (lit(10) - col("sum15") % 10) % 10)
            .otherwise(((lit(10) - col("sum15") % 10) % 10 + 5) % 10)
            .cast("string")))
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" card "), col("card")))
          .otherwise(col("text")).as("text"))
    withText
      .select(col("doc_id"), col("source"),
        // the [[Privacy.CardPattern]] constant carries \b as two chars;
        // the session's escapedStringLiterals=true hands it to the
        // regex engine intact (same route as the oracle string)
        expr(s"regexp_extract_all(text, '${Privacy.CardPattern}', 0)")
          .as("cands"))
      .select(col("doc_id"), col("source"),
        size(col("cands")).cast("long").as("n_cand"),
        expr(s"""size(filter(cands, c ->
                |  aggregate(sequence(1, 16), 0,
                |    (acc, i) -> acc + ${luhnTerm("c")}) % 10 = 0))"""
          .stripMargin).cast("long").as("n_valid"))
      .orderBy("doc_id")
  }
}
