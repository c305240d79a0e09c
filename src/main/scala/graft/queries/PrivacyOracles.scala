package graft.queries

import graft.operators.Privacy

/** DuckDB oracles for [[PrivacyQueries]]. The PII planting CTE mirrors
  * `synthDocs` exactly; the regex patterns are interpolated from the
  * SAME [[Privacy]] constants the Spark side compiles (single source of
  * truth — a pattern edit cannot desynchronize the gate). DuckDB's
  * `regexp_replace` needs the explicit 'g' flag to match Spark's
  * replace-all; counts come from `len(regexp_extract_all(...))`. */
object PrivacyOracles {

  private val em = Privacy.EmailPattern
  private val ip = Privacy.Ipv4Pattern
  private val ph = Privacy.PhonePattern

  private val synth =
    s"""WITH synth AS (SELECT doc_id, source,
       |  text
       |  || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
       |       || CAST(doc_id AS STRING) || '@example.com' ELSE '' END
       |  || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
       |       || CAST(doc_id % 200 AS STRING) || '.0.1' ELSE '' END
       |  || CASE WHEN doc_id % 7 = 0 THEN ' call 555-'
       |       || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-'
       |       || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
       |     ELSE '' END AS text
       |  FROM documents)""".stripMargin

  // NOTE: `synth` is concatenated AFTER stripMargin, never interpolated
  // into another stripMargin template — its `|| CASE` continuation lines
  // begin with whitespace+`|`, which a second stripMargin would eat
  // (turning SQL concat into bitwise-or).
  private val q140 = synth + "\n" +
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$em', 0)) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '$ip', 0)) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all(text, '$ph', 0)) AS BIGINT) AS n_phone,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$em', '${Privacy.EmailToken}', 'g'),
       |    '$ip', '${Privacy.IpToken}', 'g'),
       |    '$ph', '${Privacy.PhoneToken}', 'g')) AS scrub_md5
       |FROM synth ORDER BY doc_id""".stripMargin

  private val q141 = synth + ",\n" +
    s"""det AS (SELECT source,
       |  len(regexp_extract_all(text, '$em', 0)) AS n_email,
       |  len(regexp_extract_all(text, '$ip', 0)) AS n_ip,
       |  len(regexp_extract_all(text, '$ph', 0)) AS n_phone
       |FROM synth)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN n_email > 0 OR n_ip > 0 OR n_phone > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |  CAST(sum(n_email) AS BIGINT) AS total_email,
       |  CAST(sum(n_ip) AS BIGINT) AS total_ip,
       |  CAST(sum(n_phone) AS BIGINT) AS total_phone
       |FROM det GROUP BY source ORDER BY source""".stripMargin

  // q191 Luhn-validated card detection. The plant (15 doc_id-derived
  // digits + a check digit that is Luhn-correct only on doc_id%8=0)
  // and the per-candidate validation fold mirror PrivacyQueries.q191
  // term-for-term; `list_sum` is integer-exact here (≤ 16·9) and is
  // cast to BIGINT before any string concat so both engines render the
  // same check-digit text.
  private def luhnTerm(ref: String): String =
    s"""CASE WHEN i % 2 = 1
       |      THEN CASE WHEN 2 * CAST(substr($ref, i, 1) AS INT) > 9
       |        THEN 2 * CAST(substr($ref, i, 1) AS INT) - 9
       |        ELSE 2 * CAST(substr($ref, i, 1) AS INT) END
       |      ELSE CAST(substr($ref, i, 1) AS INT) END""".stripMargin
  private val q191 =
    s"""WITH p0 AS (SELECT doc_id, source, text,
       |    lpad(CAST((doc_id * 7919) % 1000000000000000 AS STRING),
       |         15, '0') AS d15
       |  FROM documents),
       |p1 AS (SELECT doc_id, source, text, d15,
       |    CAST(list_sum(list_transform(generate_series(1, 15),
       |      i -> ${luhnTerm("d15")})) AS BIGINT) AS sum15
       |  FROM p0),
       |p2 AS (SELECT doc_id, source,
       |    CASE WHEN doc_id % 4 = 0 THEN text || ' card ' || d15 ||
       |      CAST(CASE WHEN doc_id % 8 = 0 THEN (10 - sum15 % 10) % 10
       |        ELSE ((10 - sum15 % 10) % 10 + 5) % 10 END AS STRING)
       |      ELSE text END AS text
       |  FROM p1),
       |det AS (SELECT doc_id, source,
       |    regexp_extract_all(text, '${Privacy.CardPattern}', 0) AS cands
       |  FROM p2)
       |SELECT doc_id, source, CAST(len(cands) AS BIGINT) AS n_cand,
       |  CAST(len(list_filter(cands, c ->
       |    CAST(list_sum(list_transform(generate_series(1, 16),
       |      i -> ${luhnTerm("c")})) AS BIGINT) % 10 = 0)) AS BIGINT)
       |    AS n_valid
       |FROM det ORDER BY doc_id""".stripMargin

  val sql: Map[String, String] = Map(
    "q140_pii_scrub" -> q140,
    "q141_pii_audit" -> q141,
    "q191_luhn_card" -> q191)
}
