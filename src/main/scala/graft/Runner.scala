package graft

/** Orchestration face (SURVEY §2.7 — reference `dags/reddit_dag.py:16-24`):
  * the reference schedules its ETL daily with `retries=1` and a fixed
  * retry delay, relying on task IDEMPOTENCY for safety — a same-day
  * rerun overwrites the same dated artifact, so a retry after a partial
  * failure converges to the correct state instead of duplicating it.
  *
  * Airflow itself is out of scope; this is the Spark-native contract:
  * every sink in this library is rerun-idempotent (`mode("overwrite")`
  * CSV/parquet writes, latest-wins merges, checkpointed streams), so
  * "retry" is simply "run again". [[withRetry]] is the minimal runner
  * that encodes the DAG's attempt/delay semantics and is proven against
  * an injected mid-write failure in PipelineEndToEndSpec.
  */
object Runner {

  /** Run `task`, re-attempting up to `retries` times on failure
    * (reference: `retries=1`, `retry_delay=timedelta(seconds=300)` —
    * the delay is injectable so tests don't sleep). Returns the first
    * successful attempt's result; rethrows the last failure when
    * attempts are exhausted. `onAttempt` sees the 0-based attempt
    * number before each try (scheduling hooks, test fault injection).
    *
    * Safe ONLY around idempotent tasks: a failed attempt may leave
    * partial output, and the rerun must overwrite it — which every
    * sink in this library does. */
  def withRetry[T](retries: Int = 1, delayMs: Long = 0,
                   onAttempt: Int => Unit = _ => ())(task: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      onAttempt(attempt)
      // NonFatal only: OOM/interrupt must propagate, not re-run the
      // whole side-effecting pipeline
      try return task
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          if (attempt < retries && delayMs > 0) Thread.sleep(delayMs)
      }
      attempt += 1
    }
    throw last
  }
}
