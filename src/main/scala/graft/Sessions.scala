package graft

import org.apache.spark.sql.SparkSession

/** Session-construction confs the library's loaders rely on, applied in
  * one place so no loader mutates a live session (a global side effect
  * flagged in round 1 — `Tables.events` used to set `nanosAsLong` per
  * call). Builders (Verify, Bench, tests, user apps) call `configure`
  * before `getOrCreate`.
  */
object Sessions {
  /** Confs every graft session needs:
    *  - UTC so timestamp math matches the naive-UTC oracle;
    *  - `nanosAsLong` so parquet TIMESTAMP(NANOS) columns (events.ts)
    *    read as raw longs for [[Tables.events]] to convert;
    *  - `escapedStringLiterals` so SQL string literals keep backslashes
    *    verbatim (Hive/DuckDB behavior) — regex patterns like `\b`/`\d`
    *    in the shared-dialect oracle strings ([[SqlCompat]]) would
    *    otherwise be eaten by Spark's nonstandard escape processing;
    *  - the graft extensions (custom expressions on the SQL face plus
    *    the [[graft.plans.GraftSqlParser]] dialect bridge — ASOF JOIN
    *    and UNION-fixpoint recursion; a parser can only be injected at
    *    session construction, which is why this lives here and not in
    *    the live-session `install`).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = {
    val base = b
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parser.escapedStringLiterals", "true")
    // Diagnostic kill-switch (perf triage): SPARK_GRAFT_NO_EXTENSIONS=1
    // builds a vanilla session so extension overhead can be A/B'd.
    if (sys.env.getOrElse("SPARK_GRAFT_NO_EXTENSIONS", "0") != "0") base
    else base.config("spark.sql.extensions", "graft.plans.GraftExtensions")
  }
}
