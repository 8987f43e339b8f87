package graft.extract

import java.util.regex.Pattern

/** Scalar text helpers shared across the extraction pipeline.
  *
  * Regex flags are chosen for parity with Python `re` on str patterns
  * (Unicode-aware character classes): see `/root/reference/sidecar/chunker.py`
  * `_clean_text` (:81-83), `_NOISE_CLASSES` (:48-51), `_split_long_text`
  * (:86-101), `parse_iso_duration` (:108-133).
  */
object TextUtil {

  /** Python-`\s` (str) whitespace: Unicode White_Space ∪ \x1c-\x1f.
    * (Character.isWhitespace covers \x1c-\x1f; isSpaceChar adds the
    * no-break spaces; 0x85 NEL is in neither.) */
  @inline def isPyWs(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c) || c.toInt == 0x85

  /** `_clean_text`: collapse whitespace runs to one space, strip ends.
    * `/root/reference/sidecar/chunker.py:81-83`. Single-pass, allocation
    * only for the result (hot path: called once per DOM element). */
  def cleanText(text: String): String = {
    val n = text.length
    // fast path: already clean (no ws runs, no non-space ws, no edge ws)
    var i = 0
    var clean = n > 0 && !isPyWs(text.charAt(0)) && !isPyWs(text.charAt(n - 1))
    while (clean && i < n) {
      val c = text.charAt(i)
      if (c == ' ') { if (i + 1 < n && isPyWs(text.charAt(i + 1))) clean = false }
      else if (isPyWs(c)) clean = false
      i += 1
    }
    if (clean || n == 0) return text
    val sb = new java.lang.StringBuilder(n)
    i = 0
    var pendingSpace = false
    while (i < n) {
      val c = text.charAt(i)
      if (isPyWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Python `str.strip()` (strips Unicode whitespace incl. \x1c-\x1f). */
  def stripPy(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPyWs(s.charAt(a))) a += 1
    while (b > a && isPyWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Sentence-boundary splitter of `_split_long_text`:
    * `re.split(r"(?<=[.!?])\s+", text)` — `/root/reference/sidecar/chunker.py:92`.
    *
    * Hand-rolled single pass instead of `Pattern.split` on
    * `(?<=[.!?])[\s\x1c-\x1f\x85]+`: the lookbehind + Unicode-class regex
    * measured ~5× slower and this is ~25% of the whole extraction hot
    * loop on long-text payloads. Semantics are identical by construction:
    * split at every maximal run of Python-`\s` whitespace whose
    * immediately preceding character is `.`, `!` or `?` (greedy run =
    * maximal run here, since the lookbehind constrains only the run's
    * first character), `limit = -1` trailing-empty behavior preserved
    * (a terminal match yields a trailing "" token). Pinned against the
    * regex by the PropertySpec fuzz. */
  def splitSentences(text: String): Array[String] = {
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 1 // a match needs a preceding char
    while (i < n) {
      val c = text.charAt(i)
      if (isPyWs(c) && {
            val p = text.charAt(i - 1); p == '.' || p == '!' || p == '?'
          }) {
        var j = i + 1
        while (j < n && isPyWs(text.charAt(j))) j += 1
        out += text.substring(start, i)
        start = j
        i = j + 1
      } else i += 1
    }
    out += text.substring(start, n)
    out.toArray
  }

  /** Max chunk chars before sentence-split — `_MAX_CHUNK_LEN`,
    * `/root/reference/sidecar/chunker.py:54`.
    * NOTE: Python `len()` counts code points; we count code points too so
    * astral-plane text (emoji) splits identically. */
  val MaxChunkLen = 1500

  def cpLength(s: String): Int = s.codePointCount(0, s.length)

  /** Noise-class detector regex — `_NOISE_CLASSES`,
    * `/root/reference/sidecar/chunker.py:48-51`. Python `\b` is
    * Unicode-aware; UNICODE_CHARACTER_CLASS makes Java match. */
  val noiseClasses: Pattern = Pattern.compile(
    "(ad\\b|ads\\b|advert|banner|cookie|sidebar|menu|social|share|comment|popup|modal|newsletter|promo)",
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CHARACTER_CLASS | Pattern.UNICODE_CASE)

  def isNoise(s: String): Boolean = s.nonEmpty && noiseClasses.matcher(s).find()

  /** ISO-8601 duration humanizer — `parse_iso_duration`,
    * `/root/reference/sidecar/chunker.py:108-133`.
    * `PT25M`→"25 min", `PT1H30M`→"1h 30 min", `P1DT2H`→"1d 2h",
    * `PT45S`→"45s"; unparseable → raw input; empty → "". */
  private val isoDuration: Pattern = Pattern.compile(
    "^P(?:(\\d+)D)?T?(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+)S)?$",
    Pattern.CASE_INSENSITIVE)

  def parseIsoDuration(duration: String): String = {
    if (duration == null || duration.isEmpty) return ""
    val m = isoDuration.matcher(stripPy(duration))
    if (!m.matches()) return duration
    // BigInt: Python int() is arbitrary-precision, so PT{20+ digits}S must
    // humanize rather than throw (a NumberFormatException here would fail
    // the whole task inside mapPartitions)
    def g(i: Int): BigInt = Option(m.group(i)).filter(_.nonEmpty).map(BigInt(_)).getOrElse(BigInt(0))
    val (d, h, mi, s) = (g(1), g(2), g(3), g(4))
    val parts = Seq(
      if (d != 0) Some(s"${d}d") else None,
      if (h != 0) Some(s"${h}h") else None,
      if (mi != 0) Some(s"$mi min") else None,
      if (s != 0) Some(s"${s}s") else None,
    ).flatten
    if (parts.nonEmpty) parts.mkString(" ") else duration
  }
}
