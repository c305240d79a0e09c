package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end proof of the LIVE ingestion client against an in-JVM
  * loopback HTTP server speaking Reddit's protocol — OAuth2
  * client-credentials grant, bearer-authenticated paged /top listing
  * with `after` cursors, rate-limit headers, 429 backoff — then the
  * landed pages straight through `fromPagedDir`'s cleanse, proving the
  * live path feeds the SAME pipeline as every replayed fixture. No
  * network egress: the server binds 127.0.0.1:0. */
class RedditHttpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def respond(ex: HttpExchange, code: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def postJson(id: String, score: Int, edited: String) =
    s"""{"kind":"t3","data":{"id":"$id","title":"Title of $id",
       |"score":$score,"num_comments":3,"author":"auth_$id",
       |"created_utc":1710000000.0,"url":"https://example.invalid/$id",
       |"over_18":false,"edited":$edited,"spoiler":false,
       |"stickied":false}}""".stripMargin.replace("\n", "")

  /** Loopback Reddit: token endpoint + a 2-page /top listing. Returns
    * (server, baseUrl, requestLog). */
  private def startServer(failFirstListing: Boolean = false)
      : (HttpServer, String, collection.mutable.Buffer[String]) = {
    val log = collection.mutable.Buffer.empty[String]
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val expectBasic = "Basic " + java.util.Base64.getEncoder
      .encodeToString("cid:sec".getBytes(StandardCharsets.UTF_8))
    srv.createContext("/api/v1/access_token", (ex: HttpExchange) => {
      log += s"auth:${ex.getRequestHeaders.getFirst("Authorization")}" +
        s":ua=${ex.getRequestHeaders.getFirst("User-Agent")}"
      if (ex.getRequestHeaders.getFirst("Authorization") != expectBasic)
        respond(ex, 401, """{"error":"invalid_client"}""")
      else respond(ex, 200,
        """{"access_token":"tok123","token_type":"bearer","expires_in":3600}""")
    })
    var listingCalls = 0
    srv.createContext("/r/graft/top", (ex: HttpExchange) => {
      listingCalls += 1
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      log += s"top:$q:bearer=${ex.getRequestHeaders.getFirst("Authorization")}"
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer tok123")
        respond(ex, 401, """{"message":"Unauthorized"}""")
      else if (failFirstListing && listingCalls == 1)
        respond(ex, 429, """{"message":"Too Many Requests"}""",
          Map("x-ratelimit-remaining" -> "0", "x-ratelimit-reset" -> "7"))
      else if (!q.contains("after="))
        // page 1: two posts, a quirky edited (epoch float), cursor on
        respond(ex, 200,
          s"""{"kind":"Listing","data":{"after":"t3_c","children":[
             |${postJson("a1", 42, "false")},
             |${postJson("b2", 7, "1710000123.0")}]}}"""
            .stripMargin.replace("\n", ""),
          Map("x-ratelimit-remaining" -> "55",
            "x-ratelimit-reset" -> "120"))
      else
        // page 2: one post with a NULL author (PRAW: deleted), end
        respond(ex, 200,
          """{"kind":"Listing","data":{"after":null,"children":[
            |{"kind":"t3","data":{"id":"c3","title":" padded ",
            |"score":1,"num_comments":0,"author":null,
            |"created_utc":1710000000.0,"url":null,"over_18":true,
            |"edited":false,"spoiler":false,"stickied":true}}]}}"""
            .stripMargin.replace("\n", ""))
    })
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}", log)
  }

  private def client(base: String, slept: collection.mutable.Buffer[Long])
      : RedditHttp =
    new RedditHttp(base, s"$base/api/v1/access_token", "cid", "sec",
      "graft-test/0.1", sleeper = slept += _, pageSize = 2)

  test("OAuth grant + paged listing walk: cursors followed, bearer " +
      "sent, fields string-encoded per the landing contract") {
    val (srv, base, log) = startServer()
    try {
      val slept = collection.mutable.Buffer.empty[Long]
      val rows = client(base, slept).extractTop("graft", "day", limit = 10)
      assert(rows.size == 3, s"both pages must drain: $rows")
      assert(log.exists(_.startsWith("auth:Basic ")), "Basic grant sent")
      assert(log.count(_.startsWith("top:")) == 2, "exactly two pages")
      assert(log.exists(l => l.startsWith("top:") && l.contains("after=t3_c")),
        "page 2 must follow the after cursor")
      assert(slept.isEmpty, "budget remaining > 0 must not sleep")
      // landing contract: flat strings, quirky edited passes raw
      val m = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      val r0 = m.readTree(rows.head)
      assert(r0.get("id").asText() == "a1" &&
        r0.get("score").asText() == "42" &&
        r0.get("edited").asText() == "false")
      // numeric `edited` lands as Jackson's canonical decimal text
      // (1710000123.0 → "1710000123") — still a non-boolean string,
      // which is ALL the cleanse tri-state gate keys on (resolves to
      // false; the end-to-end test below pins that)
      val r1 = m.readTree(rows(1))
      assert(r1.get("edited").asText() == "1710000123",
        "epoch-float edited must land as its decimal text")
      val r2 = m.readTree(rows(2))
      assert(r2.get("author").isNull, "deleted author lands as null")
    } finally srv.stop(0)
  }

  test("429 backoff retries through the injectable sleeper, then " +
      "succeeds; bad credentials fail loudly") {
    val (srv, base, _) = startServer(failFirstListing = true)
    try {
      val slept = collection.mutable.Buffer.empty[Long]
      val rows = client(base, slept).extractTop("graft", "day", limit = 10)
      assert(rows.size == 3, "the retried page must still drain")
      assert(slept.nonEmpty && slept.head == 1000L,
        s"first backoff must be 1s, got $slept")
      val bad = new RedditHttp(base, s"$base/api/v1/access_token",
        "cid", "WRONG", "graft-test/0.1", sleeper = _ => ())
      val e = intercept[IllegalStateException](bad.token())
      assert(e.getMessage.contains("401"))
    } finally srv.stop(0)
  }

  test("live crawl -> landed pages -> fromPagedDir cleanse: the live " +
      "path feeds the replay pipeline byte-compatibly") {
    val (srv, base, _) = startServer()
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_live_land").toString
      val slept = collection.mutable.Buffer.empty[Long]
      val n = client(base, slept).landPages(dir, "graft", "day", limit = 10)
      assert(n == 3)
      // pageSize=2 -> two page files, plus the crawl-complete marker
      // dropped LAST (round 13's amended landing contract: `_SUCCESS`
      // IS part of the layout — marker-present means every page file
      // of this crawl was written before it)
      val files = new java.io.File(dir).listFiles().map(_.getName).sorted
      assert(files.toSeq ==
        Seq("_SUCCESS", "page-00000.jsonl", "page-00001.jsonl"))
      assert(files.head == "_SUCCESS",
        "the completion marker must exist after a successful crawl")
      val cleansed = RedditIngest.fromPagedDir(spark, dir)
        .collect().map(r => r.getAs[String]("id") -> r).toMap
      assert(cleansed.keySet == Set("a1", "b2", "c3"))
      assert(cleansed("a1").getAs[Int]("score") == 42)
      assert(cleansed("c3").getAs[String]("author") == "Unknown",
        "null author must cleanse to the reference default")
      assert(cleansed("c3").getAs[String]("title") == "padded",
        "titles trim in cleanse")
      assert(!cleansed("b2").getAs[Boolean]("edited"),
        "epoch-float edited must resolve false through the tri-state gate")
      assert(cleansed("a1").getAs[java.sql.Timestamp]("created_utc")
        .toInstant.getEpochSecond == 1710000000L)
    } finally srv.stop(0)
  }

  test("re-crawl into the same landing dir clears the prior run's page " +
      "files — fewer pages leave no stale tail (driver ADVICE r11)") {
    val (srv, base, _) = startServer()
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_live_reland").toString
      // simulate a prior, larger crawl: a stale high-numbered page that
      // this crawl (2 pages) will not overwrite, plus a foreign file
      // that is NOT ours to delete
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "page-00007.jsonl"),
        """{"id":"stale","title":"t","score":"1","author":"a","created_utc":"1"}""" + "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "notes.txt"), "keep me\n")
      val slept = collection.mutable.Buffer.empty[Long]
      val n = client(base, slept).landPages(dir, "graft", "day", limit = 10)
      assert(n == 3)
      val files = new java.io.File(dir).listFiles().map(_.getName).sorted
      assert(files.toSeq == Seq("_SUCCESS", "notes.txt", "page-00000.jsonl",
        "page-00001.jsonl"),
        s"stale page files must be cleared, foreign files kept, and the " +
          s"completion marker re-dropped last: ${files.toSeq}")
      // the landing CONTRACT is page files + the `_SUCCESS` completion
      // marker (round 13) — the re-crawl guard clears only its OWN page
      // files and marker, never foreign content; remove notes.txt before
      // the replay read (graft-paged scans every non-`_` file in the dir)
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "notes.txt"))
      val ids = RedditIngest.fromPagedDir(spark, dir)
        .collect().map(_.getAs[String]("id")).toSet
      assert(ids == Set("a1", "b2", "c3"), "no stale rows may survive")
    } finally srv.stop(0)
  }

  test("rate-limit exhaustion sleeps out the reset window between pages") {
    val log = collection.mutable.Buffer.empty[String]
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/api/v1/access_token", (ex: HttpExchange) =>
      respond(ex, 200, """{"access_token":"tok123"}"""))
    srv.createContext("/r/graft/top", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      log += q
      if (!q.contains("after="))
        respond(ex, 200,
          s"""{"kind":"Listing","data":{"after":"t3_x","children":[
             |${postJson("a1", 1, "false")}]}}"""
            .stripMargin.replace("\n", ""),
          Map("x-ratelimit-remaining" -> "0",
            "x-ratelimit-reset" -> "42"))
      else
        respond(ex, 200,
          s"""{"kind":"Listing","data":{"after":null,"children":[
             |${postJson("b2", 2, "false")}]}}"""
            .stripMargin.replace("\n", ""))
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val slept = collection.mutable.Buffer.empty[Long]
      val rows = client(base, slept).extractTop("graft", "day", limit = 10)
      assert(rows.size == 2)
      assert(slept.contains(42000L),
        s"exhausted budget must sleep reset seconds, got $slept")
    } finally srv.stop(0)
  }

  test("fromConfig wires the reference [api_keys] contract") {
    val cfg = graft.Config.parse(
      """[api_keys]
        |reddit_client_id = cid
        |reddit_secret_key = sec
        |reddit_agent = graft/1.0
        |""".stripMargin)
    // constructs fine with all three present
    RedditHttp.fromConfig(cfg): Unit
    val missing = graft.Config.parse("[api_keys]\nreddit_client_id = x\n")
    val e = intercept[IllegalArgumentException](
      RedditHttp.fromConfig(missing))
    assert(e.getMessage.contains("reddit_secret_key"))
  }
}
