package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.{Instant, LocalDate, ZoneOffset}
import scala.jdk.CollectionConverters._

/** The scheduler DAEMON (reference `dags/reddit_dag.py:16-24` +
  * `docker-compose.yml:38-61`: an Airflow `@daily` DAG with
  * `catchup=False` and `retries=1` riding a scheduler container) — the
  * piece [[Daily]] deliberately left to "the orchestrator": something
  * has to notice midnight, decide which execution dates are owed, fire
  * them, and REMEMBER what happened across its own restarts.
  *
  * Semantics (Airflow's, made explicit):
  *  - An execution date D covers the interval [D, D+1) UTC and becomes
  *    RUNNABLE only once that interval has CLOSED — i.e. from D+1
  *    00:00 UTC ("data-complete" scheduling; a daemon started mid-day
  *    never fires today's partial date).
  *  - `catchup = false` (the reference's setting): on startup, older
  *    NEVER-attempted dates are marked `skipped` and the LATEST closed
  *    unrun date fires — along with any `pending` dates, which a prior
  *    incarnation already attempted and promised to retry (skipping
  *    those would silently drop a failed day's data). `catchup = true`: the whole backlog drains
  *    oldest-first through [[Daily.backfill]]'s single AvailableNow
  *    stream — the same merge the scheduled path runs, in bounded
  *    micro-batches, so a week of downtime is one streaming drain, not
  *    seven cold JVM-sized jobs.
  *  - In-process retries stay [[Runner.withRetry]]'s (the DAG's
  *    `retries=1`); the LEDGER adds the cross-run dimension: attempts
  *    accumulate over daemon restarts, and a date that keeps failing
  *    is poisoned (`failed`, skipped thereafter) once `maxAttempts`
  *    total attempts are spent — the "don't re-run a red task forever"
  *    guard an orchestrator owes its operators.
  *
  * The ledger is a JSON-lines file replaced ATOMICALLY (temp +
  * ATOMIC_MOVE) after every state change — a daemon killed mid-write
  * leaves the previous consistent ledger, and the next incarnation
  * re-derives its duties from ledger + landing dirs + clock alone (no
  * in-memory state survives, none is needed). Scale note: the ledger
  * is orchestration METADATA (one line per execution date, driver-side
  * I/O); all data motion stays inside [[Daily]]'s O(batch + touched
  * buckets) merge.
  *
  * Landing layout: `<pagedRoot>/<yyyy-MM-dd>/` per execution date —
  * immutable once run ([[Daily]]'s contract). A closed date with NO
  * landing dir is recorded `missing` and re-examined next tick (late
  * landing), never counted as an attempt.
  *
  * The clock and sleeper are injected so tests drive days in
  * milliseconds; [[main]] wires the real ones.
  */
object Scheduler {

  /** One execution date's cross-run state. `status`:
    * `success` | `failed` (poisoned) | `skipped` (catchup=false) |
    * `missing` (no landing dir yet) | `pending` (attempts spent, will
    * retry next incarnation). */
  final case class Entry(date: String, attempts: Int, status: String)

  def readLedger(path: String): Map[String, Entry] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
      // fixed field order written by writeLedger; parse defensively
      def field(k: String) =
        s""""$k":"?([^",}]*)"?[,}]""".r.findFirstMatchIn(line)
          .map(_.group(1)).getOrElse(
            throw new IllegalStateException(s"bad ledger line: $line"))
      val e = Entry(field("date"), field("attempts").toInt, field("status"))
      e.date -> e
    }.toMap
  }

  def writeLedger(path: String, entries: Map[String, Entry]): Unit = {
    val body = entries.values.toSeq.sortBy(_.date).map { e =>
      s"""{"date":"${e.date}","attempts":${e.attempts},"status":"${e.status}"}"""
    }.mkString("", "\n", "\n")
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Latest CLOSED execution date at `now`: yesterday, UTC. */
  def latestClosed(now: Instant): LocalDate =
    now.atZone(ZoneOffset.UTC).toLocalDate.minusDays(1)

  /** Execution dates owed at `now`: closed, landing dir present, not
    * already succeeded / poisoned / skipped, attempts remaining.
    * Oldest-first. Bounded by the landing dirs that EXIST — the
    * scheduler never enumerates an unbounded date range. */
  def owedDates(pagedRoot: String, ledger: Map[String, Entry],
                now: Instant, maxAttempts: Int): Seq[String] = {
    val latest = latestClosed(now).toString
    val dirs = Option(new java.io.File(pagedRoot).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName)
      .filter(_.matches("\\d{4}-\\d{2}-\\d{2}")).sorted.toSeq
    dirs.filter(_ <= latest).filter { d =>
      ledger.get(d).forall(e =>
        e.status != "success" && e.status != "failed" &&
          e.status != "skipped" && e.attempts < maxAttempts)
    }
  }

  /** One scheduling pass: decide what is owed and run it, updating the
    * ledger after EVERY state change. Returns the dates whose state
    * changed this tick (for tests and the daemon's log line).
    *
    * `firstTick && !catchup`: Airflow's catchup=False — never-attempted
    * dates older than the latest owed date are marked `skipped`
    * (recorded, so a later restart doesn't resurrect them); `pending`
    * dates (attempts > 0, under maxAttempts) are NOT skipped — they
    * retry alongside the latest, honoring the Entry contract that a
    * pending date retries next incarnation until poisoned (r12).
    * `firstTick && catchup`: the backlog drains through ONE
    * [[Daily.backfill]] stream; per-date attribution inside a single
    * drain is impossible, so a failed drain charges one attempt to
    * every pending date — honest, and convergent (the next incarnation
    * re-drains only what is still owed; the merge is idempotent). */
  def tick(spark: SparkSession, pagedRoot: String, lakePath: String,
           ledgerPath: String, now: Instant, catchup: Boolean,
           firstTick: Boolean, retries: Int = 1, maxAttempts: Int = 3,
           checkpoint: Option[String] = None,
           runDate: (SparkSession, String, String, String, Int) => Unit =
             (s, d, dir, lake, r) => { Daily.run(s, d, dir, lake, r); () })
      : Seq[String] = {
    var ledger = readLedger(ledgerPath)
    var touched = List.empty[String]
    def record(e: Entry): Unit = {
      ledger += (e.date -> e); touched ::= e.date
      writeLedger(ledgerPath, ledger)
    }
    var owed = owedDates(pagedRoot, ledger, now, maxAttempts)
    if (firstTick && !catchup && owed.size > 1) {
      // catchup=False skips only dates this daemon lineage NEVER
      // attempted. A `pending` date (attempts > 0, under maxAttempts)
      // holds the class-doc promise "will retry next incarnation" —
      // overwriting it to `skipped` just because a newer closed date is
      // also owed would silently drop a failed day's data after one
      // attempt (driver ADVICE r11). Pending dates retry alongside the
      // latest; only fresh never-attempted backlog is skipped.
      val latest = owed.last
      val (retried, fresh) = owed.dropRight(1)
        .partition(d => ledger.get(d).exists(_.attempts > 0))
      fresh.foreach { d =>
        record(Entry(d, ledger.get(d).map(_.attempts).getOrElse(0),
          "skipped"))
      }
      owed = retried :+ latest
    }
    if (firstTick && catchup && owed.size > 1) {
      val prior = owed.map(d => d -> ledger.get(d).map(_.attempts)
        .getOrElse(0)).toMap
      try {
        val ckpt = checkpoint.getOrElse(Files
          .createTempDirectory("graft_sched_ckpt").toString)
        Daily.backfill(spark,
          owed.map(d => d -> s"$pagedRoot/$d"), lakePath, ckpt)
        owed.foreach(d => record(Entry(d, prior(d) + 1, "success")))
      } catch {
        case scala.util.control.NonFatal(_) =>
          owed.foreach { d =>
            val a = prior(d) + 1
            record(Entry(d, a, if (a >= maxAttempts) "failed" else "pending"))
          }
      }
      return touched.reverse
    }
    owed.foreach { d =>
      val prior = ledger.get(d).map(_.attempts).getOrElse(0)
      try {
        runDate(spark, d, s"$pagedRoot/$d", lakePath, retries)
        record(Entry(d, prior + 1, "success"))
      } catch {
        case scala.util.control.NonFatal(_) =>
          val a = prior + 1
          record(Entry(d, a, if (a >= maxAttempts) "failed" else "pending"))
      }
    }
    // closed dates whose landing dir has not appeared yet: visible in
    // the ledger as `missing`, re-examined every tick, zero attempts
    val latest = latestClosed(now).toString
    if (ledger.get(latest).isEmpty &&
        !Files.isDirectory(Paths.get(s"$pagedRoot/$latest"))) {
      record(Entry(latest, 0, "missing"))
    }
    touched.reverse
  }

  /** Millis from `now` until the next UTC midnight, plus `graceMs`
    * (landing pipelines finish writing a date's directory shortly
    * after the day closes; the grace keeps the daemon from racing
    * them). */
  def untilNextFire(now: Instant, graceMs: Long): Long = {
    val nextMidnight = now.atZone(ZoneOffset.UTC).toLocalDate.plusDays(1)
      .atStartOfDay(ZoneOffset.UTC).toInstant
    java.time.Duration.between(now, nextMidnight).toMillis + graceMs
  }

  /** The daemon: tick, sleep to the next midnight, repeat. `maxTicks`
    * bounds the loop for tests; the production main passes
    * Int.MaxValue. Missed-while-asleep dates (a laptop lid, a paused
    * container) surface naturally: the post-sleep tick re-derives owed
    * dates from the clock, so a sleep that overshot three midnights
    * finds three owed dates — catchup semantics then apply only to the
    * FIRST tick; later ticks run every owed date sequentially (they
    * were missed ON this daemon's watch, Airflow's behavior exactly). */
  def loop(spark: SparkSession, pagedRoot: String, lakePath: String,
           ledgerPath: String, clock: () => Instant,
           sleeper: Long => Unit, catchup: Boolean, maxTicks: Int,
           retries: Int = 1, maxAttempts: Int = 3,
           graceMs: Long = 60000L,
           onTick: Seq[String] => Unit = _ => (),
           runDate: (SparkSession, String, String, String, Int) => Unit =
             (s, d, dir, lake, r) => { Daily.run(s, d, dir, lake, r); () })
      : Unit = {
    var ticks = 0
    while (ticks < maxTicks) {
      val ran = tick(spark, pagedRoot, lakePath, ledgerPath, clock(),
        catchup = catchup, firstTick = ticks == 0, retries = retries,
        maxAttempts = maxAttempts, runDate = runDate)
      onTick(ran)
      ticks += 1
      if (ticks < maxTicks) sleeper(untilNextFire(clock(), graceMs))
    }
  }

  /** CLI: `graft.Scheduler <pagedRoot> <lakePath> <ledgerPath>
    * [catchup]` — runs forever on the real clock. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.Scheduler <pagedRoot> <lakePath> <ledgerPath> [catchup]")
    val Array(pagedRoot, lakePath, ledgerPath) = args.take(3)
    val catchup = args.lift(3).contains("catchup")
    val spark = Sessions.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    loop(spark, pagedRoot, lakePath, ledgerPath,
      clock = () => Instant.now(), sleeper = Thread.sleep,
      catchup = catchup, maxTicks = Int.MaxValue,
      onTick = ran => println(
        s"""{"task":"scheduler_tick","changed":${ran.size}}"""))
  }
}
