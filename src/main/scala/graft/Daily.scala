package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The scheduled production entry (reference `dags/reddit_dag.py:16-26`:
  * a daily task with `retries=1` and a fixed retry delay): ONE execution
  * date's landing pages → parse + cleanse → latest-wins merge into the
  * bucketed lake. The orchestrator (Airflow, cron, anything) only has to
  * invoke `graft.Daily <yyyy-MM-dd> <pagedLandingDir> <lakePath>` — all
  * retry safety lives in the task body:
  *
  *  - the merge is STAGED and manifest-gated ([[graft.sources.Lake
  *    .mergeInto]]): a crash mid-merge leaves either the old table or
  *    the new one, never a torn mix, and the next attempt recovers;
  *  - the batch is stamped with the execution date as its merge
  *    timestamp, so a same-day rerun re-asserts the same (key, ts)
  *    facts — latest-wins converges to the identical table instead of
  *    duplicating rows (the idempotency the reference DAG relies on).
  *
  * CONTRACT: a date's landing directory is immutable once run — the
  * standard scheduler assumption this idempotency rests on. If the
  * landing data for an already-run date is CORRECTED, rerunning the
  * same date ties the old and new row on (key, ts) and latest-wins
  * picks arbitrarily; land corrections under a new execution date (or a
  * dedicated revision field wired as the merge `tsCol`) instead.
  *
  * Scale shape: the day's pages scan once (count is observed during the
  * merge's bucket-discovery pass, narrow), and the merge rewrites only
  * the key buckets the batch touches — daily cost is O(batch + touched
  * buckets), never O(lake).
  */
object Daily {

  /** Run one execution date. Returns the cleansed row count merged. */
  def run(spark: SparkSession, date: String, pagedDir: String,
          lakePath: String, retries: Int = 1, delayMs: Long = 0): Long =
    Runner.withRetry(retries, delayMs) {
      val batch = graft.ingest.RedditIngest.fromPagedDir(spark, pagedDir)
        .withColumn("snapshot_ts", to_timestamp(lit(date), "yyyy-MM-dd"))
      val obs = new org.apache.spark.sql.Observation()
      graft.sources.Lake.mergeInto(
        batch.observe(obs, count(lit(1)).as("rows")),
        lakePath, keyCol = "id", tsCol = "snapshot_ts")
      obs.get("rows").asInstanceOf[Long]
    }

  /** Catch-up for MISSED execution dates through the STREAMING face:
    * each date's landing directory becomes a `graft-paged` readStream
    * stamped with its execution date (exactly [[run]]'s batch), the
    * stamped streams union, and ONE `Trigger.AvailableNow` invocation
    * of [[graft.streaming.StreamingOps.upsertStreamPartitioned]] drains
    * them in bounded micro-batches — whose `foreachBatch` body IS
    * `Lake.mergeInto`, the SAME merge the scheduled [[run]] calls. One
    * code path, two cadences: a backlog of missed days and a normal
    * scheduled day cannot drift because there is nothing separate to
    * drift (PipelineEndToEndSpec asserts the drain is byte-identical
    * to sequential [[run]] calls).
    *
    * Latest-wins over the date-stamped merge timestamp makes the drain
    * order-insensitive: whether the drain lands two dates in one
    * micro-batch or several, a key's newest execution date wins, which
    * is exactly where sequential daily runs converge. Blocks until the
    * backlog is fully merged. */
  def backfill(spark: SparkSession, dates: Seq[(String, String)],
               lakePath: String, checkpoint: String): Unit = {
    require(dates.nonEmpty, "backfill needs at least one (date, dir)")
    val stamped = dates.map { case (date, pagedDir) =>
      graft.ingest.RedditIngest.fromPagedStream(spark, pagedDir)
        .withColumn("snapshot_ts", to_timestamp(lit(date), "yyyy-MM-dd"))
    }
    val q = graft.streaming.StreamingOps.upsertStreamPartitioned(
      stamped.reduce(_ unionByName _), keyCol = "id",
      sinkPath = lakePath, checkpoint = checkpoint,
      tsCol = "snapshot_ts",
      trigger =
        Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
  }

  /** CLI: the scheduled single-date run, or the missed-days drain —
    * {{{
    * graft.Daily <yyyy-MM-dd> <pagedLandingDir> <lakePath>
    * graft.Daily backfill <lakePath> <checkpointDir> <date>=<dir> [<date>=<dir> ...]
    * }}} */
  def main(args: Array[String]): Unit = {
    // reuse a live session when embedded (tests, notebooks); only a
    // session this main created gets stopped on exit
    val pre = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    val spark = pre.getOrElse {
      val s = Sessions.configure(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false"))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    try args.toList match {
      case "backfill" :: lakePath :: checkpoint :: specs if specs.nonEmpty =>
        val dates = specs.map { sp =>
          sp.split("=", 2) match {
            case Array(date, dir) if date.nonEmpty && dir.nonEmpty =>
              date -> dir
            case _ => throw new IllegalArgumentException(
              s"bad backfill spec '$sp' (want date=dir)")
          }
        }
        backfill(spark, dates, lakePath, checkpoint)
        println(s"""{"task":"backfill","dates":${dates.size}}""")
      case date :: pagedDir :: lakePath :: Nil if date != "backfill" =>
        val n = run(spark, date, pagedDir, lakePath)
        println(s"""{"task":"daily","date":"$date","rows":$n}""")
      case _ => throw new IllegalArgumentException(
        "usage: graft.Daily <yyyy-MM-dd> <pagedLandingDir> <lakePath>\n" +
          "     | graft.Daily backfill <lakePath> <checkpointDir> " +
          "<date>=<dir> [<date>=<dir> ...]")
    } finally if (pre.isEmpty) spark.stop()
  }
}
