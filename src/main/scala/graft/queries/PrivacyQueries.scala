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
    documents(s, d).select(col("doc_id"), col("source"),
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
}
