package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.time.Instant

/** The composed LIVE production path (reference `dags/reddit_dag.py:
  * 29-47` → `pipelines/reddit_pipeline.py` → `etls/reddit_etl.py:
  * 87-128`: ONE scheduled task whose body is extract → transform →
  * load) — the piece round 11 left unwired: [[graft.ingest.RedditHttp
  * .landPages]] produced the exact `page-NNNNN.jsonl` landing layout
  * [[Daily]]/[[Scheduler]] consume, but nothing composed
  * token → pages → cleanse → merge end-to-end.
  *
  * Two faces, one composition:
  *  - [[run]] — one execution date: crawl the subreddit's top listing
  *    through the OAuth2/paginated/rate-limited client INTO
  *    `<pagedRoot>/<date>/`, then hand the immutable landing dir to
  *    [[Daily.run]]'s staged latest-wins merge. Idempotent like the
  *    reference's task: a rerun re-crawls (clearing its own stale page
  *    files first — landPages' guard), re-stamps the same execution
  *    date, and latest-wins converges to the identical lake.
  *  - [[tick]] — the live DAEMON face: if the latest CLOSED execution
  *    date has no landing dir yet, crawl it first, then delegate to
  *    [[Scheduler.tick]] — which sees the fresh dir as owed and runs
  *    the standard merge with the cross-restart attempt ledger. The
  *    crawl only fills the gap the scheduler is about to examine;
  *    every retry/catchup/poison rule stays the scheduler's.
  *
  * Scale note: the crawl is driver-side by design (Reddit caps
  * listings at ~1000 posts — a single authenticated page walk;
  * distribution buys nothing), and everything downstream of the
  * landing dir is [[Daily]]'s O(batch + touched buckets) merge. */
object Live {

  /** One live execution date end-to-end. Returns (posts landed, rows
    * merged). The landing dir is `<pagedRoot>/<date>` — created by the
    * crawl, immutable to everything downstream. */
  def run(spark: SparkSession, client: graft.ingest.RedditHttp,
          date: String, pagedRoot: String, lakePath: String,
          subreddit: String, timeFilter: String = "day",
          limit: Int = 100, retries: Int = 1): (Long, Long) = {
    val dir = s"$pagedRoot/$date"
    val landed = client.landPages(dir, subreddit, timeFilter, limit)
    val merged = Daily.run(spark, date, dir, lakePath, retries)
    (landed, merged)
  }

  /** Live scheduling pass: land the latest closed date if its dir is
    * absent (a crawl is NOT an attempt — failures surface before any
    * ledger change, and the date stays `missing` for the next tick),
    * then run the standard [[Scheduler.tick]]. Returns its result. */
  def tick(spark: SparkSession, client: graft.ingest.RedditHttp,
           pagedRoot: String, lakePath: String, ledgerPath: String,
           now: Instant, catchup: Boolean, firstTick: Boolean,
           subreddit: String, timeFilter: String = "day",
           limit: Int = 100, retries: Int = 1,
           maxAttempts: Int = 3): Seq[String] = {
    val latest = Scheduler.latestClosed(now).toString
    val dir = Paths.get(pagedRoot, latest)
    if (!Files.isDirectory(dir))
      client.landPages(dir.toString, subreddit, timeFilter, limit)
    Scheduler.tick(spark, pagedRoot, lakePath, ledgerPath, now, catchup,
      firstTick, retries, maxAttempts)
  }

  /** CLI — one date, config-driven credentials:
    * {{{
    * graft.Live <configPath> <yyyy-MM-dd> <pagedRoot> <lakePath> <subreddit> [timeFilter] [limit]
    * }}}
    * `configPath` is the reference's ini contract
    * (`[api_keys] reddit_client_id / reddit_secret_key /
    * reddit_agent`). */
  def main(args: Array[String]): Unit = {
    val (cfgPath, date, pagedRoot, lakePath, subreddit, tf, limit) =
      args.toList match {
        case c :: d :: p :: l :: s :: rest if rest.size <= 2 =>
          (c, d, p, l, s, rest.headOption.getOrElse("day"),
            rest.drop(1).headOption.map(_.toInt).getOrElse(100))
        case _ => throw new IllegalArgumentException(
          "usage: graft.Live <configPath> <yyyy-MM-dd> <pagedRoot> " +
            "<lakePath> <subreddit> [timeFilter] [limit]")
      }
    val client = graft.ingest.RedditHttp.fromConfig(Config.load(cfgPath))
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
    try {
      val (landed, merged) =
        run(spark, client, date, pagedRoot, lakePath, subreddit, tf, limit)
      println(s"""{"task":"live","date":"$date","landed":$landed,""" +
        s""""merged":$merged}""")
    } finally if (pre.isEmpty) spark.stop()
  }
}
