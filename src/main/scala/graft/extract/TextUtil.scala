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

  /** Python `\s` on str also matches the information-separator controls
    * \x1c-\x1f (and \x85), which Java's `(?U)\s` (Unicode White_Space)
    * does not. Union them explicitly. */
  private val wsRun: Pattern =
    Pattern.compile("[\\s\\x1c-\\x1f\\x85]+", Pattern.UNICODE_CHARACTER_CLASS)

  /** `_clean_text`: collapse whitespace runs to one space, strip ends.
    * `/root/reference/sidecar/chunker.py:81-83`. */
  def cleanText(text: String): String = {
    val collapsed = wsRun.matcher(text).replaceAll(" ")
    stripPy(collapsed)
  }

  /** Python `str.strip()` (strips Unicode whitespace incl. \x1c-\x1f). */
  def stripPy(s: String): String = {
    var a = 0
    var b = s.length
    def isWs(c: Char): Boolean =
      Character.isWhitespace(c) || Character.isSpaceChar(c) || (c >= 28 && c <= 31) || c.toInt == 0x85
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Sentence-boundary splitter of `_split_long_text`:
    * `re.split(r"(?<=[.!?])\s+", text)` — `/root/reference/sidecar/chunker.py:92`. */
  private val sentenceSplit: Pattern =
    Pattern.compile("(?<=[.!?])[\\s\\x1c-\\x1f\\x85]+", Pattern.UNICODE_CHARACTER_CLASS)

  def splitSentences(text: String): Array[String] = sentenceSplit.split(text, -1)

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
    def g(i: Int): Long = Option(m.group(i)).filter(_.nonEmpty).map(_.toLong).getOrElse(0L)
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
