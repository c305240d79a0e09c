package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.time.Instant

/** The scheduler daemon's contract (reference `dags/reddit_dag.py` +
  * its scheduler container): interval-closed firing, catchup=False
  * skip-vs-catchup=True drain, cross-RESTART retry accumulation with
  * the poison guard, atomic ledger recovery, and the midnight sleep
  * math — all on an injected clock, no real sleeping. */
class SchedulerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def post(id: String, score: Int, utc: Long = 1710000000L) =
    s"""{"id":"$id","title":"t-$id","score":"$score","author":"a","created_utc":"$utc"}"""

  /** pagedRoot with one landing dir per date, one page each. */
  private def landing(dates: Seq[String]): String = {
    val root = Files.createTempDirectory("graft_sched_land").toString
    dates.zipWithIndex.foreach { case (d, i) =>
      Files.createDirectories(Paths.get(root, d))
      Files.writeString(Paths.get(root, d, "page-00000.jsonl"),
        Seq(post(s"p$i", 10 + i), post("shared", 100 + i))
          .mkString("", "\n", "\n"))
    }
    root
  }

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  // 2024-03-12 09:00 UTC: dates 03-09..03-11 are closed, 03-12 is open
  private val now = Instant.parse("2024-03-12T09:00:00Z")

  test("catchup=false startup: older missed dates are skipped, only " +
      "the latest closed date runs") {
    val root = landing(Seq("2024-03-09", "2024-03-10", "2024-03-11"))
    val lake = tmp("graft_sched_lake") + "/posts"
    val ledger = tmp("graft_sched_led") + "/ledger.jsonl"
    val ran = Scheduler.tick(spark, root, lake, ledger, now,
      catchup = false, firstTick = true)
    val state = Scheduler.readLedger(ledger)
    assert(state("2024-03-09").status == "skipped")
    assert(state("2024-03-10").status == "skipped")
    assert(state("2024-03-11").status == "success")
    assert(state("2024-03-11").attempts == 1)
    assert(ran.toSet == Set("2024-03-09", "2024-03-10", "2024-03-11"))
    // the lake holds ONLY the latest date's batch (skipped ≠ merged)
    val ids = spark.read.parquet(lake).collect()
      .map(_.getAs[String]("id")).toSet
    assert(ids == Set("p2", "shared"))
    // second tick same day: nothing newly owed, ledger stable
    val ran2 = Scheduler.tick(spark, root, lake, ledger, now,
      catchup = false, firstTick = false)
    assert(ran2.isEmpty)
    assert(Scheduler.readLedger(ledger) == state)
  }

  test("catchup=true startup: the whole backlog drains in one stream " +
      "and converges to the sequential-runs lake") {
    val dates = Seq("2024-03-09", "2024-03-10", "2024-03-11")
    val root = landing(dates)
    // expected: sequential Daily.run per date
    val seqLake = tmp("graft_sched_seq") + "/posts"
    dates.foreach(d => Daily.run(spark, d, s"$root/$d", seqLake))
    val expect = spark.read.parquet(seqLake).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("score")).toMap

    val lake = tmp("graft_sched_cu") + "/posts"
    val ledger = tmp("graft_sched_led2") + "/ledger.jsonl"
    Scheduler.tick(spark, root, lake, ledger, now,
      catchup = true, firstTick = true,
      checkpoint = Some(tmp("graft_sched_ck")))
    val state = Scheduler.readLedger(ledger)
    assert(dates.forall(state(_).status == "success"))
    val got = spark.read.parquet(lake).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("score")).toMap
    assert(got == expect,
      s"drain must converge to sequential runs: $got vs $expect")
    // latest-wins sanity: 'shared' holds the newest execution date's
    // metrics in both worlds
    assert(got("shared") == 102)
  }

  test("cross-restart retry state: attempts accumulate over daemon " +
      "incarnations and the poison guard trips at maxAttempts") {
    val root = landing(Seq("2024-03-11"))
    val lake = tmp("graft_sched_fail") + "/posts"
    val ledger = tmp("graft_sched_led3") + "/ledger.jsonl"
    val boom = (_: org.apache.spark.sql.SparkSession, _: String,
                _: String, _: String, _: Int) =>
      throw new RuntimeException("task failure")
    // incarnation 1 fails -> pending, attempts 1
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, maxAttempts = 2, runDate = boom)
    val s1 = Scheduler.readLedger(ledger)("2024-03-11")
    assert(s1.status == "pending" && s1.attempts == 1)
    // incarnation 2 (fresh firstTick — daemon restarted) fails again ->
    // attempts 2 == maxAttempts -> poisoned
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, maxAttempts = 2, runDate = boom)
    val s2 = Scheduler.readLedger(ledger)("2024-03-11")
    assert(s2.status == "failed" && s2.attempts == 2)
    // incarnation 3: poisoned date never re-fires, even though the
    // task would now succeed
    var fired = 0
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, maxAttempts = 2,
      runDate = (_, _, _, _, _) => fired += 1)
    assert(fired == 0, "poisoned date must not re-run")
  }

  test("a pending (non-poisoned) date re-fires after restart and its " +
      "success clears the debt") {
    val root = landing(Seq("2024-03-11"))
    val lake = tmp("graft_sched_rec") + "/posts"
    val ledger = tmp("graft_sched_led4") + "/ledger.jsonl"
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, maxAttempts = 3,
      runDate = (_, _, _, _, _) => throw new RuntimeException("boom"))
    // restart: the real task runs this time
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, maxAttempts = 3)
    val s = Scheduler.readLedger(ledger)("2024-03-11")
    assert(s.status == "success" && s.attempts == 2,
      "prior incarnation's attempt must count toward the total")
    assert(spark.read.parquet(lake).count() == 2)
  }

  test("catchup=false restart does NOT abandon a pending date when a " +
      "newer closed date is also owed (driver ADVICE r11)") {
    val root = landing(Seq("2024-03-09", "2024-03-10", "2024-03-11"))
    val lake = tmp("graft_sched_pend") + "/posts"
    val ledger = tmp("graft_sched_led8") + "/ledger.jsonl"
    // incarnation 1, a day earlier: 03-09 never attempted -> skipped,
    // latest closed date 03-10 fails -> pending with 1 attempt
    val day1 = Instant.parse("2024-03-11T09:00:00Z")
    Scheduler.tick(spark, root, lake, ledger, day1, catchup = false,
      firstTick = true, maxAttempts = 3,
      runDate = (_, _, _, _, _) => throw new RuntimeException("boom"))
    val s1 = Scheduler.readLedger(ledger)
    assert(s1("2024-03-09").status == "skipped")
    assert(s1("2024-03-10").status == "pending" && s1("2024-03-10").attempts == 1)
    // incarnation 2 next day: 03-11 is newly owed. The pending 03-10
    // must RETRY alongside it — not be overwritten to skipped
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, maxAttempts = 3)
    val s2 = Scheduler.readLedger(ledger)
    assert(s2("2024-03-10").status == "success" && s2("2024-03-10").attempts == 2,
      s"pending date must retry next incarnation, got ${s2("2024-03-10")}")
    assert(s2("2024-03-11").status == "success" && s2("2024-03-11").attempts == 1)
    assert(s2("2024-03-09").status == "skipped",
      "never-attempted backlog stays skipped")
    // both retried and latest batches merged; latest-wins on 'shared'
    val got = spark.read.parquet(lake).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("score")).toMap
    assert(got.keySet == Set("p1", "p2", "shared"))
    assert(got("shared") == 102, "latest execution date must win the upsert")
  }

  test("open intervals never fire; a closed date with no landing dir " +
      "is recorded missing with zero attempts") {
    val root = landing(Seq("2024-03-12")) // TODAY's dir — interval open
    val lake = tmp("graft_sched_open") + "/posts"
    val ledger = tmp("graft_sched_led5") + "/ledger.jsonl"
    var fired = 0
    Scheduler.tick(spark, root, lake, ledger, now, catchup = false,
      firstTick = true, runDate = (_, _, _, _, _) => fired += 1)
    assert(fired == 0, "an open interval must never fire")
    val state = Scheduler.readLedger(ledger)
    assert(state("2024-03-11").status == "missing")
    assert(state("2024-03-11").attempts == 0,
      "a missing landing dir is not a task attempt")
  }

  test("loop on a fake clock: the post-midnight tick fires exactly the " +
      "newly closed date; sleep targets the next midnight plus grace") {
    val root = landing(Seq("2024-03-11", "2024-03-12"))
    val lake = tmp("graft_sched_loop") + "/posts"
    val ledger = tmp("graft_sched_led6") + "/ledger.jsonl"
    // clock: first tick at 09:00 on the 12th, then (after the sleep)
    // just past midnight on the 13th — the 12th has newly closed
    var t = now
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    Scheduler.loop(spark, root, lake, ledger,
      clock = () => t,
      sleeper = ms => {
        slept += ms
        t = Instant.parse("2024-03-13T00:01:00Z")
      },
      catchup = false, maxTicks = 2,
      runDate = (_, d, _, _, _) => fired += d)
    assert(fired.toSeq == Seq("2024-03-11", "2024-03-12"),
      s"one date per closing midnight: $fired")
    // 09:00 -> next midnight is 15h away, plus the default 60s grace
    assert(slept.head == 15L * 3600 * 1000 + 60000L,
      s"sleep must target next UTC midnight + grace, got ${slept.head}")
    val state = Scheduler.readLedger(ledger)
    assert(state("2024-03-11").status == "success")
    assert(state("2024-03-12").status == "success")
  }

  test("ledger round-trip is atomic-replace and parse-stable") {
    val dir = tmp("graft_sched_led7")
    val p = s"$dir/ledger.jsonl"
    val entries = Map(
      "2024-03-09" -> Scheduler.Entry("2024-03-09", 2, "failed"),
      "2024-03-10" -> Scheduler.Entry("2024-03-10", 1, "success"))
    Scheduler.writeLedger(p, entries)
    assert(Scheduler.readLedger(p) == entries)
    assert(!Files.exists(Paths.get(p + ".tmp")),
      "atomic move must leave no temp file behind")
  }
}
