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

  /** Live scheduling pass: land the latest closed date unless its dir
    * carries the crawl-complete `_SUCCESS` marker (a crawl is NOT an
    * attempt — failures surface before any ledger change, and the date
    * stays `missing` for the next tick), then run the standard
    * [[Scheduler.tick]]. Returns its result.
    *
    * The marker — not bare directory existence — is the guard: a crawl
    * that died between `createDirectories` and its last page write
    * leaves a partial dir, and trusting the dir would skip the re-crawl
    * forever while the scheduler merged the partial data as a success
    * with silently missing rows. [[graft.ingest.RedditHttp.landPages]]
    * drops the marker LAST and clears it FIRST, so (against process
    * crashes — see landPages' durability note) marker-present ⇒ every
    * page file of that crawl was fully written before it.
    *
    * A date the LEDGER already settled (`success`/`failed`/`skipped`)
    * is never re-crawled, marker or no marker (r13 ADVICE): landing
    * dirs that predate the marker protocol — or lost their marker —
    * were already merged, and re-crawling one would rewrite an
    * IMMUTABLE replay input with later data while the lake keeps the
    * original rows. Only genuinely unsettled dates (absent from the
    * ledger, or recorded un-terminal) get the marker check. */
  def tick(spark: SparkSession, client: graft.ingest.RedditHttp,
           pagedRoot: String, lakePath: String, ledgerPath: String,
           now: Instant, catchup: Boolean, firstTick: Boolean,
           subreddit: String, timeFilter: String = "day",
           limit: Int = 100, retries: Int = 1,
           maxAttempts: Int = 3): Seq[String] = {
    val latest = Scheduler.latestClosed(now).toString
    val dir = Paths.get(pagedRoot, latest)
    val settled = Scheduler.readLedger(ledgerPath).get(latest).exists(e =>
      e.status == "success" || e.status == "failed" || e.status == "skipped")
    if (!settled &&
        !Files.exists(dir.resolve(graft.ingest.RedditHttp.SuccessMarker)))
      client.landPages(dir.toString, subreddit, timeFilter, limit)
    Scheduler.tick(spark, pagedRoot, lakePath, ledgerPath, now, catchup,
      firstTick, retries, maxAttempts)
  }

  /** The live DAEMON loop — [[Scheduler.loop]]'s shape with [[tick]]
    * as the body, so ONE long-running command is the reference's full
    * production posture (scheduler container + the DAG's crawl+merge
    * task): tick (crawl the latest closed date if its crawl-complete
    * marker is absent, then schedule/merge under the attempt ledger),
    * sleep to the next UTC midnight + grace, repeat. Clock and sleeper
    * are injected so tests drive days in milliseconds; [[daemon]]
    * wires the real ones. `maxTicks` bounds the loop for tests. */
  def loop(spark: SparkSession, client: graft.ingest.RedditHttp,
           pagedRoot: String, lakePath: String, ledgerPath: String,
           clock: () => Instant, sleeper: Long => Unit,
           catchup: Boolean, maxTicks: Int, subreddit: String,
           timeFilter: String = "day", limit: Int = 100,
           retries: Int = 1, maxAttempts: Int = 3,
           graceMs: Long = 60000L,
           onTick: Seq[String] => Unit = _ => ()): Unit = {
    var ticks = 0
    while (ticks < maxTicks) {
      val ran = tick(spark, client, pagedRoot, lakePath, ledgerPath,
        clock(), catchup = catchup, firstTick = ticks == 0,
        subreddit = subreddit, timeFilter = timeFilter, limit = limit,
        retries = retries, maxAttempts = maxAttempts)
      onTick(ran)
      ticks += 1
      if (ticks < maxTicks)
        sleeper(Scheduler.untilNextFire(clock(), graceMs))
    }
  }

  /** CLI-shaped daemon entry (the argv contract [[main]]'s `daemon`
    * mode forwards to; clock/sleeper/maxTicks/URLs injectable so the
    * spec drives the SAME entry against the loopback server):
    * {{{
    * <configPath> <pagedRoot> <lakePath> <ledgerPath> <subreddit> [catchup] [timeFilter] [limit]
    * }}} */
  def daemon(args: Seq[String], spark: SparkSession,
             clock: () => Instant = () => Instant.now(),
             sleeper: Long => Unit = Thread.sleep,
             maxTicks: Int = Int.MaxValue,
             baseUrl: String = graft.ingest.RedditHttp.ProdBaseUrl,
             authUrl: String = graft.ingest.RedditHttp.ProdAuthUrl,
             onTick: Seq[String] => Unit = ran => println(
               s"""{"task":"live_tick","changed":${ran.size}}""")): Unit = {
    val (cfgPath, pagedRoot, lakePath, ledgerPath, subreddit, rest) =
      args.toList match {
        case c :: p :: l :: led :: s :: r if r.size <= 3 =>
          (c, p, l, led, s, r)
        case _ => throw new IllegalArgumentException(
          "usage: graft.Live daemon <configPath> <pagedRoot> <lakePath> " +
            "<ledgerPath> <subreddit> [catchup] [timeFilter] [limit]")
      }
    val catchup = rest.contains("catchup")
    val nonFlag = rest.filterNot(_ == "catchup")
    val tf = nonFlag.headOption.getOrElse("day")
    val limit = nonFlag.drop(1).headOption.map(_.toInt).getOrElse(100)
    val client = graft.ingest.RedditHttp.fromConfig(
      Config.load(cfgPath), baseUrl, authUrl)
    loop(spark, client, pagedRoot, lakePath, ledgerPath, clock, sleeper,
      catchup, maxTicks, subreddit, tf, limit, onTick = onTick)
  }

  /** CLI. One date:
    * {{{
    * graft.Live <configPath> <yyyy-MM-dd> <pagedRoot> <lakePath> <subreddit> [timeFilter] [limit]
    * }}}
    * or the daemon (runs forever on the real clock, [[Scheduler.main]]'s
    * posture with the crawl composed in):
    * {{{
    * graft.Live daemon <configPath> <pagedRoot> <lakePath> <ledgerPath> <subreddit> [catchup] [timeFilter] [limit]
    * }}}
    * `configPath` is the reference's ini contract
    * (`[api_keys] reddit_client_id / reddit_secret_key /
    * reddit_agent`). */
  def main(args: Array[String]): Unit = {
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
      if (args.headOption.contains("daemon")) {
        daemon(args.drop(1).toSeq, spark)
      } else {
        val (cfgPath, date, pagedRoot, lakePath, subreddit, tf, limit) =
          args.toList match {
            case c :: d :: p :: l :: s :: rest if rest.size <= 2 =>
              (c, d, p, l, s, rest.headOption.getOrElse("day"),
                rest.drop(1).headOption.map(_.toInt).getOrElse(100))
            case _ => throw new IllegalArgumentException(
              "usage: graft.Live <configPath> <yyyy-MM-dd> <pagedRoot> " +
                "<lakePath> <subreddit> [timeFilter] [limit]  |  " +
                "graft.Live daemon <configPath> <pagedRoot> <lakePath> " +
                "<ledgerPath> <subreddit> [catchup] [timeFilter] [limit]")
          }
        val client = graft.ingest.RedditHttp.fromConfig(Config.load(cfgPath))
        val (landed, merged) =
          run(spark, client, date, pagedRoot, lakePath, subreddit, tf, limit)
        println(s"""{"task":"live","date":"$date","landed":$landed,""" +
          s""""merged":$merged}""")
      }
    } finally if (pre.isEmpty) spark.stop()
  }
}
