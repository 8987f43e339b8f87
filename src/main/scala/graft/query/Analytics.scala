package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analytics event surface re-expressed as batch column
  * transforms — `/root/reference/sidecar/analytics_provider.py:16-191`
  * (BOT_FAMILIES / detect_bot / the 6 typed events) and the middleware
  * emission rules of `/root/reference/sidecar/main.py:225-300`:
  *
  *  - a rate-limited request emits ONLY `api.ratelimit` (the 429 early
  *    return — no api.request for it);
  *  - otherwise `api.request` when status < 500, plus `api.bot` when the
  *    UA resolves to a known bot family, plus `api.search` / `api.sync`
  *    for the matching 200-handlers and `api.error` for 4xx/5xx.
  *
  * Everything is codegen'd expressions (when-chains + one explode); the
  * event fan-out is bounded (≤ 4 events per request), so the derived event
  * table is O(requests) and the rollup shuffles only its narrow grouping
  * keys.
  */
object Analytics {

  /** analytics_provider.py:16-30 — BOT_FAMILIES, insertion-ordered. */
  val BotFamilies: Seq[(String, String)] = Seq(
    "GPTBot" -> "openai", "ChatGPT-User" -> "openai",
    "ClaudeBot" -> "anthropic", "anthropic-ai" -> "anthropic",
    "PerplexityBot" -> "perplexity", "Google-Extended" -> "google",
    "Googlebot" -> "google", "CCBot" -> "common-crawl",
    "cohere-ai" -> "cohere", "FacebookBot" -> "meta",
    "Amazonbot" -> "amazon", "YouBot" -> "you", "Bytespider" -> "bytedance")

  /** detect_bot (analytics_provider.py:33-41): first pattern whose
    * lowercase form is a substring of the lowercase UA wins, in dict
    * insertion order; empty/null UA → ("unknown", "unknown"); no match →
    * ("human-or-unknown", "unknown"). Returns a (bot_name, bot_family)
    * struct column. */
  def detectBot(ua: Column): Column = {
    def pair(name: String, family: String): Column =
      struct(lit(name).as("bot_name"), lit(family).as("bot_family"))
    val lowered = lower(ua)
    val chain = BotFamilies.foldLeft(
      when(ua.isNull || ua === "", pair("unknown", "unknown"))) {
      case (acc, (pat, fam)) =>
        acc.when(lowered.contains(pat.toLowerCase(java.util.Locale.ROOT)),
          pair(pat, fam))
    }
    chain.otherwise(pair("human-or-unknown", "unknown"))
  }

  /** Driver-local twin of [[detectBot]] (same insertion-order,
    * case-insensitive substring semantics) — powers the `of_detect_bot` /
    * `of_bot_family` SQL functions. */
  def detectBotLocal(ua: String): (String, String) =
    if (ua == null || ua.isEmpty) ("unknown", "unknown")
    else {
      val lowered = ua.toLowerCase(java.util.Locale.ROOT)
      BotFamilies.find { case (p, _) =>
        lowered.contains(p.toLowerCase(java.util.Locale.ROOT))
      }.getOrElse(("human-or-unknown", "unknown"))
    }

  /** Derive the typed event stream from a request log carrying
    * (path, ua, status_code, duration_ms, rate_limited, q_term, is_sync,
    * day). One input row fans out to its event rows (explode of a bounded
    * when-array, nulls compacted); every emission rule mirrors the
    * middleware order above. Passes through all request columns plus
    * `event_type`, `bot_name`, `bot_family`, `endpoint` (the first path
    * segment — the reference rolls up on endpoint, analytics dashboards
    * don't want per-page cardinality). */
  def deriveEvents(requests: DataFrame): DataFrame = {
    val bot = detectBot(col("ua"))
    val notLimited = !col("rate_limited")
    val events = array(
      when(col("rate_limited"), lit("api.ratelimit")),
      when(notLimited && col("status_code") < 500, lit("api.request")),
      when(notLimited && col("status_code") < 500 &&
        col("bot_family") =!= "unknown", lit("api.bot")),
      when(notLimited && col("status_code") >= 400, lit("api.error")),
      when(notLimited && col("status_code") === 200 &&
        col("q_term").isNotNull, lit("api.search")),
      when(notLimited && col("status_code") === 200 &&
        col("q_term").isNull && col("is_sync"), lit("api.sync")))
    requests
      .withColumn("bot_name", bot.getField("bot_name"))
      .withColumn("bot_family", bot.getField("bot_family"))
      .withColumn("endpoint", regexp_extract(col("path"), "^/[^/]*", 0))
      .withColumn("event_type", explode(array_compact(events)))
  }

  /** The ANALYTICS.md headline rollup: events by bot_family × endpoint ×
    * day — request counts, total duration, and the api.request subset.
    * Map-side combinable; shuffles only (bot_family, endpoint, day). */
  def rollup(events: DataFrame): DataFrame =
    events.groupBy("bot_family", "endpoint", "day")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "api.request", 1L).otherwise(0L)).as("n_requests"),
        sum(when(col("event_type") === "api.bot", 1L).otherwise(0L)).as("n_bot"),
        sum(col("duration_ms")).as("sum_duration_ms"))
}
