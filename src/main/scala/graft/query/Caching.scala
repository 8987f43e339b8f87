package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTTP conditional-response semantics of the reference adapters, as pure
  * codegen'd column expressions over a request/response log.
  *
  * Reference behavior (pinned by `/root/reference/testing/test-caching.js`):
  *
  *  - ETag = `'"' + md5(JSON.stringify(body)).hex.slice(0, 16) + '"'`
  *    (`/root/reference/adapters/express/src/etag.js:11-13`) — a quoted
  *    16-hex-char md5 prefix of the serialized response body;
  *  - 304 Not Modified iff the request's `If-None-Match` header equals
  *    the computed ETag EXACTLY (string equality, no weak-validator or
  *    list handling — `handlers/content.js:282-283,347-348`,
  *    `handlers/discovery.js:45-47`);
  *  - `If-Modified-Since` is deliberately NOT honored: only ETag
  *    revalidation exists (test-caching.js:219-225 pins a 200 for a past
  *    If-Modified-Since with no If-None-Match);
  *  - `Last-Modified` = max item published date rendered with JS
  *    `toUTCString()` ("Wed, 15 Jan 2025 10:00:00 GMT"), now() when no
  *    dates parse (`handlers/content.js:30-35`).
  *
  * All md5-based, so the whole classification is DuckDB-portable and
  * oracle-checked end-to-end (c1_conditional_cache).
  */
object Caching {

  /** etag.js:11-13 — quoted 16-hex md5 prefix of the serialized body. */
  def etag(body: Column): Column =
    concat(lit("\""), substring(md5(body), 1, 16), lit("\""))

  /** content.js:282-283 — 304 iff If-None-Match equals the ETag exactly;
    * a null/absent header (or any mismatch, including an unquoted form)
    * is a 200. Null-safe: `null === x` is null → otherwise branch, the
    * same outcome as JS `undefined === etag` being false. */
  def conditionalStatus(etagCol: Column, ifNoneMatch: Column): Column =
    when(ifNoneMatch === etagCol, 304).otherwise(200)

  /** content.js:30-35 — JS `new Date(maxPublished).toUTCString()` render
    * of a timestamp column: "EEE, dd MMM yyyy HH:mm:ss GMT". Callers
    * aggregate the max over their item set first; this renders it.
    *
    * JS toUTCString always renders the UTC wall clock, while Spark's
    * `date_format` renders in the SESSION timezone — so the instant is
    * first shifted with `to_utc_timestamp(ts, current_timezone())`,
    * making the rendered fields the UTC ones under ANY session timezone
    * (exact for UTC and fixed-offset zones; a DST-observing session zone
    * can still be off by the offset delta for instants within one
    * transition window of a DST switch — run UTC sessions, as every
    * entry point in this repo pins, for exactness there too). */
  def toUtcString(ts: Column): Column =
    concat(date_format(to_utc_timestamp(ts, current_timezone()),
      "EEE, dd MMM yyyy HH:mm:ss"), lit(" GMT"))
}
