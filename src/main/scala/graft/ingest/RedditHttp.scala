package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** LIVE Reddit API client (reference `etls/reddit_etl.py:29-58` — a
  * PRAW `Reddit(client_id, client_secret, user_agent)` in read-only
  * mode streaming `subreddit.top(time_filter, limit)`), re-expressed
  * on the JDK's own `java.net.http.HttpClient` — ZERO new
  * dependencies, and the JSON layer is the Jackson Spark already
  * ships. What PRAW hides, this spells out, because it is the part a
  * production ingester must own:
  *
  *  - **OAuth2 application-only grant**: POST `authUrl` with
  *    `grant_type=client_credentials`, HTTP Basic
  *    `clientId:clientSecret`, the caller's User-Agent (Reddit
  *    throttles default agents to uselessness) → bearer token.
  *  - **Listing pagination**: GET `/r/{sub}/top?t={filter}&limit=…`
  *    walks the `data.after` fullname cursor until the API returns
  *    `after: null` or the caller's limit is reached — the same
  *    lazy page walk [[graft.sources.paged.PagedSource]] models for
  *    the landed form.
  *  - **Rate-limit protocol**: Reddit's `x-ratelimit-remaining` /
  *    `x-ratelimit-reset` headers are honored BETWEEN pages (sleep to
  *    the reset when the budget is exhausted), and 429/5xx responses
  *    retry with exponential backoff through the injectable `sleeper`
  *    — tests drive hours in milliseconds.
  *  - **Landing contract**: [[landPages]] writes `page-NNNNN.jsonl`
  *    files whose rows are flat `{field: string}` objects over
  *    [[RedditIngest.PostFields]] — byte-compatible with what
  *    [[RedditIngest.fromPagedDir]] and the `graft-paged` source
  *    already consume, so the LIVE path and the REPLAY path share
  *    every downstream operator (cleanse, merge, Daily, Scheduler).
  *    Values are string-encoded exactly as the landed fixtures are
  *    (`score: "42"`, `edited: "false"` or the raw epoch float) —
  *    the cleanse layer owns typing, the transport does not guess.
  *
  * The client is DRIVER-side by design, like the reference's: the API
  * is a single authenticated paged stream (Reddit caps listings at
  * ~1000 posts), so distribution buys nothing — scale lives downstream
  * of the landing directory. Base URLs are injectable; production
  * defaults are Reddit's ([[RedditHttp.Prod]]), tests point both at a
  * loopback server.
  */
final class RedditHttp(baseUrl: String, authUrl: String,
                       clientId: String, clientSecret: String,
                       userAgent: String,
                       sleeper: Long => Unit = Thread.sleep,
                       maxRetries: Int = 3,
                       pageSize: Int = 100) {
  require(clientId.nonEmpty && clientSecret.nonEmpty,
    "client_id and client_secret are required (reference config " +
      "[api_keys] reddit_client_id / reddit_secret_key)")
  require(userAgent.nonEmpty,
    "a descriptive user_agent is required (Reddit throttles blank ones)")
  require(maxRetries >= 0 && pageSize >= 1 && pageSize <= 100,
    "maxRetries >= 0; pageSize in [1, 100] (Reddit's listing cap)")

  // floats as BigDecimal: a re-serialized epoch like `edited:
  // 1710000123.0` must keep its plain literal form (DoubleNode would
  // print 1.710000123E9 — not what the landing contract stores)
  private val mapper = new ObjectMapper().configure(
    com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)
  private val http = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL).build()

  /** POST the client-credentials grant; returns the bearer token.
    * Fails loudly on a non-200 or a token-less body — a misconfigured
    * credential must never degrade into an empty crawl. */
  def token(): String = {
    val basic = Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
    val req = HttpRequest.newBuilder(URI.create(authUrl))
      .header("Authorization", s"Basic $basic")
      .header("User-Agent", userAgent)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(
        "grant_type=client_credentials"))
      .build()
    val resp = send(req)
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"token request failed: HTTP ${resp.statusCode()} ${resp.body()}")
    val node = mapper.readTree(resp.body())
    val tok = Option(node.get("access_token")).map(_.asText(""))
      .getOrElse("")
    if (tok.isEmpty)
      throw new IllegalStateException(
        s"token response carries no access_token: ${resp.body()}")
    tok
  }

  /** One listing page: flat post JSON lines (string-encoded fields in
    * [[RedditIngest.PostFields]] order) + the next `after` cursor. */
  private[ingest] def fetchPage(bearer: String, subreddit: String,
                                timeFilter: String, limit: Int,
                                after: Option[String])
      : (Seq[String], Option[String]) = {
    val qs = s"t=$timeFilter&limit=$limit&raw_json=1" +
      after.map(a => s"&after=$a").getOrElse("")
    val req = HttpRequest.newBuilder(
        URI.create(s"$baseUrl/r/$subreddit/top?$qs"))
      .header("Authorization", s"Bearer $bearer")
      .header("User-Agent", userAgent)
      .GET().build()
    val resp = send(req)
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"listing request failed: HTTP ${resp.statusCode()} ${resp.body()}")
    respectRateLimit(resp)
    val data = mapper.readTree(resp.body()).path("data")
    val posts = {
      val it = data.path("children").elements()
      val buf = Seq.newBuilder[String]
      while (it.hasNext) buf += flatten(it.next().path("data"))
      buf.result()
    }
    val next = Option(data.get("after")).filter(!_.isNull)
      .map(_.asText()).filter(_.nonEmpty)
    (posts, next)
  }

  /** A child's `data` node → one landing-contract JSON line: every
    * [[RedditIngest.PostFields]] field string-encoded (absent → JSON
    * null; booleans/numbers via their JSON text — `edited`'s
    * false-or-epoch-float quirk passes through raw for the cleanse
    * tri-state gate to resolve). */
  private def flatten(post: JsonNode): String = {
    val out = mapper.createObjectNode()
    RedditIngest.PostFields.foreach { f =>
      val v = post.get(f)
      if (v == null || v.isNull) out.putNull(f)
      else if (v.isTextual) out.put(f, v.asText())
      else out.put(f, v.toString)
    }
    mapper.writeValueAsString(out)
  }

  /** Stream up to `limit` posts as landing-contract JSON lines —
    * the [[RedditIngest.PostFields]] projection of
    * `subreddit.top(time_filter, limit)` (reference
    * `reddit_etl.py:43-58`), page-walked lazily. */
  def extractTop(subreddit: String, timeFilter: String,
                 limit: Int): Seq[String] = {
    require(limit >= 1, "limit must be positive")
    val bearer = token()
    val buf = Seq.newBuilder[String]
    var got = 0
    var after: Option[String] = None
    var done = false
    while (!done) {
      val want = math.min(pageSize, limit - got)
      val (posts, next) = fetchPage(bearer, subreddit, timeFilter,
        want, after)
      val take = posts.take(limit - got)
      buf ++= take
      got += take.size
      after = next
      done = got >= limit || next.isEmpty || posts.isEmpty
    }
    buf.result()
  }

  /** Live crawl → landed pages: writes `page-NNNNN.jsonl` files of
    * `pageSize` rows to `dir` and returns the post count. The output
    * is the EXACT landing layout the replayable pipeline starts from
    * ([[RedditIngest.fromPagedDir]], `graft-paged` streaming, `Daily`,
    * `Scheduler`) — the live client's only job is to land bytes. */
  def landPages(dir: String, subreddit: String, timeFilter: String,
                limit: Int): Long = {
    val rows = extractTop(subreddit, timeFilter, limit)
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    // Crash-visible completion protocol: drop the `_SUCCESS` marker
    // FIRST, so a crawl that dies mid-write leaves a dir that reads as
    // incomplete (Live.tick re-crawls on a missing marker instead of
    // trusting bare directory existence — a partial dir merged as-is
    // would mark the date success with silently missing rows), and
    // re-write it LAST after every page file is written. Scope of the
    // guarantee (r13 ADVICE): the delete-first/write-last ORDERING
    // protects against PROCESS crashes only — plain Files.writeString
    // carries no fsync, so a power loss or FS write reordering can
    // persist the marker while page contents are lost; a deployment
    // that must survive power failure should mount the landing root on
    // a journaled-data filesystem or add force/sync channels here. The
    // read path ignores `_`-prefixed files (PagedSource.listPages).
    java.nio.file.Files.deleteIfExists(d.resolve(RedditHttp.SuccessMarker))
    // the landing dir is IMMUTABLE input to the replayable pipeline: a
    // re-crawl that lands fewer pages must not leave the prior run's
    // higher-numbered page files behind (fromPagedDir would silently
    // ingest the mixed crawl). Clear our own page files first; anything
    // else in the dir is not ours to touch and fails the write below.
    Option(d.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("page-\\d{5}\\.jsonl"))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    rows.grouped(pageSize).zipWithIndex.foreach { case (page, i) =>
      java.nio.file.Files.writeString(
        d.resolve(f"page-$i%05d.jsonl"),
        page.mkString("", "\n", "\n"))
    }
    java.nio.file.Files.writeString(d.resolve(RedditHttp.SuccessMarker), "")
    rows.size.toLong
  }

  /** Send with 429/5xx exponential backoff (1s, 2s, 4s … through the
    * injectable sleeper); other statuses return to the caller. */
  private def send(req: HttpRequest): HttpResponse[String] = {
    var attempt = 0
    var resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    while ((resp.statusCode() == 429 || resp.statusCode() >= 500) &&
        attempt < maxRetries) {
      sleeper(1000L << attempt)
      attempt += 1
      resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    }
    resp
  }

  /** Between pages: if the rate budget is spent, sleep out the window
    * (`x-ratelimit-reset` seconds). Header-less responses are a no-op. */
  private def respectRateLimit(resp: HttpResponse[String]): Unit = {
    def hdr(name: String): Option[String] = {
      val o = resp.headers().firstValue(name)
      if (o.isPresent) Some(o.get) else None
    }
    val remaining = hdr("x-ratelimit-remaining").flatMap(_.toDoubleOption)
    val reset = hdr("x-ratelimit-reset").flatMap(_.toLongOption)
    (remaining, reset) match {
      case (Some(r), Some(sec)) if r <= 0 => sleeper(sec * 1000L)
      case _ => ()
    }
  }
}

object RedditHttp {
  /** Production endpoints (the values PRAW uses). */
  val ProdBaseUrl = "https://oauth.reddit.com"
  val ProdAuthUrl = "https://www.reddit.com/api/v1/access_token"

  /** Completion marker a finished crawl drops last into its landing
    * dir; its absence means the crawl died mid-write and must rerun.
    * `_`-prefixed so every reader (PagedSource.listPages, Hadoop
    * convention) skips it. */
  val SuccessMarker = "_SUCCESS"

  /** Wire from the reference's config contract
    * (`[api_keys] reddit_client_id / reddit_secret_key /
    * reddit_agent`, `utils/constants.py:8-10`). */
  def fromConfig(cfg: graft.Config.GraftConfig,
                 baseUrl: String = ProdBaseUrl,
                 authUrl: String = ProdAuthUrl,
                 sleeper: Long => Unit = Thread.sleep): RedditHttp = {
    def need(k: String) = cfg.get("api_keys", k).getOrElse(
      throw new IllegalArgumentException(s"config [api_keys] $k missing"))
    new RedditHttp(baseUrl, authUrl, need("reddit_client_id"),
      need("reddit_secret_key"), need("reddit_agent"), sleeper)
  }
}
