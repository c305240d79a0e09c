package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PII scrub: redaction correctness per kind, the fixed email→IP→phone
  * order contract, no-op identity on clean text, and the narrow-map
  * plan claim (zero exchanges). */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrubOne(s: String): String =
    Privacy.scrub(Seq(s).toDF("text"), "text").head().getString(0)

  test("each kind redacts; clean text passes byte-identical") {
    assert(scrubOne("mail me at jo.doe+x@sub.example.com today")
      == "mail me at <EMAIL> today")
    assert(scrubOne("server 192.168.10.254 down") == "server <IP> down")
    assert(scrubOne("call 555-867-5309 now") == "call <PHONE> now")
    val clean = "no personal data here, just 12345 and a-b-c."
    assert(scrubOne(clean) == clean)
  }

  test("order contract: the email pass consumes alpha-TLD addresses " +
      "whole; a dotted-quad 'domain' is left for the IP pass") {
    assert(scrubOne("a@mail.example.com vs 1.2.3.4")
      == "<EMAIL> vs <IP>")
    // digits-only TLD fails the email pattern, so only the quad redacts
    assert(scrubOne("weird a@10.0.0.1 form") == "weird a@<IP> form")
  }

  test("word boundaries: versions and longer digit runs do not " +
      "over-match phones") {
    // 4-3-4 digit grouping must not match the 3-3-4 phone pattern
    assert(scrubOne("id 5551-867-5309 kept") == "id 5551-867-5309 kept")
    assert(scrubOne("v1.2.3 stays") == "v1.2.3 stays")
  }

  test("stats counts match planted occurrences") {
    val df = Seq(
      "a@b.co and c@d.org at 1.2.3.4",
      "nothing",
      "555-123-4567 or 555-765-4321").toDF("text")
    val r = Privacy.stats(df, "text")
      .select("n_email", "n_ip", "n_phone").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(r.toSeq == Seq((2, 1, 0), (0, 0, 0), (0, 0, 2)))
  }

  test("scrub is a narrow codegen'd map: zero exchanges in the plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Privacy.scrub(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scrub must not shuffle:\n$plan")
    assert(plan.contains("*(1) Project"),
      s"scrub must ride whole-stage codegen (the *(n) marker):\n$plan")
  }
}
