package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins every analytics emission rule to its reference call site in
  * `/root/reference/sidecar/main.py`. Each test names the line range it
  * mirrors; together they cover the full middleware + handler tracking
  * surface (and the two rules the reference does NOT have: no api.error
  * — `track_error` has zero handler call sites — and no handler events
  * for non-GET / non-feed requests).
  */
case class AnalyticsSpecReq(doc_id: Long, method: String, path: String, ua: String,
  status_code: Int, duration_ms: Long, rate_limited: Boolean,
  q_term: Option[String], is_sync: Boolean, url_param: Option[String],
  day: String)

class AnalyticsSpec extends AnyFunSuite {
  import AnalyticsSpec.Req

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("analytics-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (event_type, request_type) pairs emitted for a single request. */
  private def eventsOf(r: Req): Set[(String, String)] = {
    val s = spark; import s.implicits._
    Analytics.deriveEvents(Seq(r).toDF())
      .select("event_type", "request_type").collect()
      .map(row => (row.getString(0), Option(row.getString(1)).getOrElse("-")))
      .toSet
  }

  private def req(path: String = "/openfeeder", method: String = "GET",
      ua: String = "Mozilla/5.0", status: Int = 200, limited: Boolean = false,
      q: Option[String] = None, sync: Boolean = false,
      url: Option[String] = None): Req =
    Req(1L, method, path, ua, status, 42L, limited, q, sync, url, "2024-01-01")

  test("index 200: middleware api.request (main.py:269-280) + handler api.request/index (main.py:480)") {
    assert(eventsOf(req()) ==
      Set("api.request" -> "-", "api.request" -> "index"))
  }

  test("search 200 from a bot: + api.bot (main.py:283-291) + api.search (main.py:548-558) + handler search (main.py:562)") {
    assert(eventsOf(req(ua = "GPTBot/1.0", q = Some("x"))) ==
      Set("api.request" -> "-", "api.bot" -> "-",
        "api.search" -> "-", "api.request" -> "search"))
  }

  test("zero-result search 404 STILL emits api.search (main.py:510-522 tracks before returning 404)") {
    assert(eventsOf(req(status = 404, q = Some("x"))) ==
      Set("api.request" -> "-", "api.search" -> "-", "api.request" -> "search"))
  }

  test("single-page 404: handler tracks request_type=single (main.py:600-607), no search event") {
    assert(eventsOf(req(status = 404, url = Some("/a"))) ==
      Set("api.request" -> "-", "api.request" -> "single"))
  }

  test("sync 200: api.sync (main.py:444-452) + handler api.request/stats (main.py:455-470)") {
    assert(eventsOf(req(sync = true)) ==
      Set("api.request" -> "-", "api.sync" -> "-", "api.request" -> "stats"))
  }

  test("sync precedence loses to search when q is present (main.py:394 'and not q')") {
    assert(eventsOf(req(sync = true, q = Some("x"))) ==
      Set("api.request" -> "-", "api.search" -> "-", "api.request" -> "search"))
  }

  test("non-feed 404 emits ONLY middleware api.request — NO api.error (track_error has zero call sites)") {
    assert(eventsOf(req(path = "/blog/x", status = 404)) ==
      Set("api.request" -> "-"))
  }

  test("5xx emits nothing (middleware status<500 gate, main.py:270; handler threw before tracking)") {
    assert(eventsOf(req(path = "/blog/x", status = 500)).isEmpty)
  }

  test("rate-limited request emits ONLY api.ratelimit (429 early return, main.py:231-256)") {
    assert(eventsOf(req(limited = true, q = Some("x"), ua = "GPTBot/1.0")) ==
      Set("api.ratelimit" -> "-"))
  }

  test("internal endpoints skip the limiter and track unconditionally, even 5xx (main.py:206-225)") {
    assert(eventsOf(req(path = "/healthz", status = 500, limited = true)) ==
      Set("api.request" -> "-"))
  }

  test("internal endpoints never emit api.bot (track_bot_activity only on the non-internal path)") {
    assert(eventsOf(req(path = "/.well-known/openfeeder.json", ua = "GPTBot/1.0")) ==
      Set("api.request" -> "-"))
  }

  test("non-GET feed requests get middleware events only (the GET handler never runs)") {
    assert(eventsOf(req(method = "POST", q = Some("x"), ua = "ClaudeBot/1.0")) ==
      Set("api.request" -> "-", "api.bot" -> "-"))
  }
}

object AnalyticsSpec {
  type Req = AnalyticsSpecReq
  val Req = AnalyticsSpecReq
}
