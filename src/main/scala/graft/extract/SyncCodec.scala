package graft.extract

import java.nio.charset.StandardCharsets
import java.time.{Instant, OffsetDateTime, LocalDateTime, ZoneOffset}
import java.util.Base64

/** Differential-sync token / timestamp helpers.
  *
  * Mirrors `/root/reference/sidecar/sync_utils.py:25-50`:
  *  - `encode_sync_token(iso)` = base64(json {"t": iso}) (Python json.dumps
  *    default spacing)
  *  - `decode_sync_token(token)` → epoch seconds or None
  *  - `parse_since(raw)` → RFC-3339 datetime first, then sync_token
  */
object SyncCodec {

  def encodeSyncToken(asOfIso: String): String = {
    val payload = JsonLite.renderPy(JObj(
      scala.collection.immutable.VectorMap("t" -> JStr(asOfIso))))
    Base64.getEncoder.encodeToString(payload.getBytes(StandardCharsets.UTF_8))
  }

  /** Python `datetime.fromisoformat` (3.11+): accepts offsets and naive
    * datetimes; naive → epoch under UTC here (the sidecar pins UTC). */
  def parseIsoTimestamp(raw: String): Option[Double] = {
    val s = raw.trim
    if (s.isEmpty) return None
    val zulu = if (s.endsWith("Z") || s.endsWith("z")) s.dropRight(1) + "+00:00" else s
    try Some(OffsetDateTime.parse(zulu).toInstant.toEpochMilli / 1000.0)
    catch {
      case _: Exception =>
        try {
          val ldt = LocalDateTime.parse(zulu)
          Some(ldt.toInstant(ZoneOffset.UTC).toEpochMilli / 1000.0)
        } catch {
          case _: Exception =>
            try { // date-only form "2023-05-15"
              val d = java.time.LocalDate.parse(zulu)
              Some(d.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli / 1000.0)
            } catch { case _: Exception => None }
        }
    }
  }

  def decodeSyncToken(token: String): Option[Double] =
    try {
      val payload = new String(Base64.getDecoder.decode(token), StandardCharsets.UTF_8)
      JsonLite.parse(payload) match {
        case Some(o: JObj) => o.get("t") match {
          case Some(JStr(t)) => parseIsoTimestamp(t)
          case _ => None
        }
        case _ => None
      }
    } catch { case _: Exception => None }

  /** `parse_since`: RFC-3339 first, sync_token fallback — sync_utils.py:41-50. */
  def parseSince(raw: String): Option[Double] =
    parseIsoTimestamp(raw).orElse(decodeSyncToken(raw))

  /** Render an epoch-seconds instant the way the sidecar emits `as_of`
    * (`datetime.now(timezone.utc).isoformat()` → `...+00:00`). */
  def toIsoUtc(epochSeconds: Double): String = {
    val inst = Instant.ofEpochMilli(math.round(epochSeconds * 1000.0))
    val odt = OffsetDateTime.ofInstant(inst, ZoneOffset.UTC)
    val base = odt.toLocalDateTime.toString // 2026-01-01T00:00 or with secs/frac
    val withSecs = if (base.count(_ == ':') == 1) base + ":00" else base
    withSecs + "+00:00"
  }
}
