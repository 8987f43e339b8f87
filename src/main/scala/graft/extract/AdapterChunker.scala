package graft.extract

import java.util.regex.Pattern

/** The cross-adapter "canonical" ~500-word chunker, identical across the
  * reference's 9 framework ports in cleaning and greedy packing, with
  * per-adapter TYPE-DETECTION (and word-count/trim) variants. Default
  * semantics follow the Express adapter (superset variant):
  * `/root/reference/adapters/express/src/chunker.js:12-136`
  * (constants :12, cleanHtml :19-34, countWords :40-42, detectType :48-73,
  * chunkContent :82-122, summarise :131-136). [[Variant.Wp]] and
  * [[Variant.FastApi]] reproduce the WordPress and FastAPI ports' exact
  * divergences — see [[Variant]].
  */
object AdapterChunker {

  val WordsPerChunk = 500

  /** Which adapter port's semantics to run. The three ports share the
    * regex-identical clean pipeline and greedy 500-word packing; they
    * diverge in chunk-type detection, word counting, and trimming. */
  sealed trait Variant
  object Variant {
    /** chunker.js:48-73 — code → quote → heading → list → paragraph,
      * `[-*+]` bullets, JS whitespace-split word count. The superset
      * variant (the only one detecting code/quote). */
    case object Express extends Variant
    /** `/root/reference/adapters/wordpress/includes/class-chunker.php:152-174`
      * — LIST IS CHECKED BEFORE HEADING (a single-line bullet is a list
      * here, a heading in express), bullets are `[-*]` only (no `+`), no
      * code/quote detection, and the heading word count is PHP
      * `str_word_count` — alphabetic runs (with `'`/`-`), so digits
      * contribute nothing. Packing word budgets use `str_word_count` too
      * (class-chunker.php:112), paragraph filtering is PHP `array_filter`
      * (drops the falsy "0" paragraph, :100), and an all-content "0"
      * returns no chunks (`empty($content)`, :95-97). */
    case object Wp extends Variant
    /** `/root/reference/adapters/fastapi/openfeeder_fastapi/chunker.py:39-54`
      * — heading before list (like express) but NO code/quote detection,
      * and Python string semantics: `splitlines()` boundaries (`\r`,
      * `\v`, `\f`, … split lines here; only `\n` does in JS/PHP),
      * `str.strip()`, `str.split()` word counting. */
    case object FastApi extends Variant
  }

  final case class AChunk(id: String, text: String, chunkType: String,
      relevance: Option[Double] = None)

  private val tagRe = Pattern.compile("<[^>]*>")
  private val spaceTabRe = Pattern.compile("[ \\t]+")
  private val manyNewlinesRe = Pattern.compile("\\n{3,}")
  private val wsSplitRe = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)
  private val paraSplitRe = Pattern.compile("\\n{2,}")
  private val listLineRe = Pattern.compile("^(\\d+[.)]\\s|[-*+]\\s)",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** JS `String.prototype.trim()`: Unicode whitespace + BOM. */
  private def jsTrim(s: String): String = {
    var a = 0; var b = s.length
    def ws(c: Char) = Character.isWhitespace(c) || Character.isSpaceChar(c) || c == '﻿'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** C1: strip tags, decode exactly 6 entities (sequentially, so `&amp;lt;`
    * becomes `<`, as in the JS), collapse spaces/tabs, squeeze blank lines —
    * chunker.js:19-34. */
  def cleanHtml(html: String): String = {
    var text = tagRe.matcher(html).replaceAll(" ")
    text = text.replace("&amp;", "&")
    text = text.replace("&lt;", "<")
    text = text.replace("&gt;", ">")
    text = text.replace("&quot;", "\"")
    text = text.replace("&#039;", "'")
    text = text.replace("&nbsp;", " ")
    text = spaceTabRe.matcher(text).replaceAll(" ")
    text = manyNewlinesRe.matcher(text).replaceAll("\n\n")
    jsTrim(text)
  }

  /** chunker.js:40-42. */
  def countWords(text: String): Int =
    wsSplitRe.split(jsTrim(text), -1).count(_.nonEmpty)

  /** C4: code / quote / heading / list / paragraph — chunker.js:48-73. */
  def detectType(text: String): String = {
    val trimmed = jsTrim(text)
    val lines = trimmed.split("\n", -1)
    if (trimmed.startsWith("```")) "code"
    else if (trimmed.startsWith(">")) "quote"
    else if (lines.length == 1 && countWords(text) < 15) "heading"
    else {
      val listLines = lines.count(l => listLineRe.matcher(jsTrim(l)).find())
      if (lines.nonEmpty && listLines.toDouble / lines.length >= 0.5) "list"
      else "paragraph"
    }
  }

  /** [[detectType]] under a specific adapter port's semantics. */
  def detectType(text: String, variant: Variant): String = variant match {
    case Variant.Express => detectType(text)
    case Variant.Wp => detectTypeWp(text)
    case Variant.FastApi => detectTypeFastApi(text)
  }

  // ---- PHP string semantics (WP variant) ------------------------------

  /** PHP `trim()` default charlist: " \t\n\r\0\x0B" — ASCII only. */
  private def phpTrim(s: String): String = {
    val chars = " \t\n\r\u0000\u000B"
    var a = 0; var b = s.length
    while (a < b && chars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && chars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** PHP `str_word_count($s)` (C locale, no extra charlist): scans for
    * tokens of `[A-Za-z'-]`, where a token may start at `'`/`-` only when
    * not at position 0 of the string, and a trailing `-` as the LAST
    * character of the string is excluded before the scan (`e--` in the C
    * source) — so digits never contribute ("Chapter 22" counts 1), a bare
    * "--" mid-string counts as a word, and "ab -" counts 1, not 2.
    * Transliterated from ext/standard/string.c `php_str_word_count`. */
  private[extract] def phpStrWordCount(s: String): Int = {
    @inline def isAlpha(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    @inline def isWordChar(c: Char) = isAlpha(c) || c == '\'' || c == '-'
    // "the last character cannot be -": one trailing hyphen is trimmed
    val end = if (s.nonEmpty && s.charAt(s.length - 1) == '-') s.length - 1
      else s.length
    var i = 0; var count = 0
    while (i < end) {
      val c = s.charAt(i)
      if (isAlpha(c) || ((c == '\'' || c == '-') && i != 0)) {
        count += 1
        while (i < end && isWordChar(s.charAt(i))) i += 1
      } else i += 1
    }
    count
  }

  /** PCRE (no /u): ASCII `\d`/`\s`, bullets `[-*]` only —
    * class-chunker.php:161. */
  private val wpListRe = Pattern.compile("^(\\d+[.)]\\s|[-*]\\s)")

  /** class-chunker.php:152-174: list FIRST (`$list_lines > 0 &&
    * $list_lines >= count($lines)/2` — float division), then single-line
    * `str_word_count < 15` heading, else paragraph. */
  private def detectTypeWp(text: String): String = {
    val trimmed = phpTrim(text)
    val lines = trimmed.split("\n", -1)
    val listLines = lines.count(l => wpListRe.matcher(phpTrim(l)).find())
    if (listLines > 0 && listLines >= lines.length / 2.0) "list"
    else if (lines.length == 1 && phpStrWordCount(trimmed) < 15) "heading"
    else "paragraph"
  }

  // ---- Python string semantics (FastAPI variant) ----------------------

  /** Python `str.isspace()` per char: the ASCII control whitespace incl.
    * \x1c-\x1f and \x85, plus Unicode Zs/Zl/Zp. */
  @inline private def pyIsSpace(c: Char): Boolean = c.toInt match {
    case 0x09 | 0x0A | 0x0B | 0x0C | 0x0D | 0x1C | 0x1D | 0x1E | 0x1F |
         0x85 => true
    case _ => Character.getType(c) match {
      case Character.SPACE_SEPARATOR | Character.LINE_SEPARATOR |
           Character.PARAGRAPH_SEPARATOR => true
      case _ => false
    }
  }

  /** Python `str.strip()`. */
  private[extract] def pyStrip(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && pyIsSpace(s.charAt(a))) a += 1
    while (b > a && pyIsSpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Python `str.splitlines()`: universal-newline boundaries (\n \r \r\n
    * \v \f \x1c \x1d \x1e \x85 U+2028 U+2029), no trailing empty line,
    * "" → zero lines. */
  private[extract] def pySplitlines(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val code = c.toInt
      val isBreak = code == 0x0A || code == 0x0D || code == 0x0B ||
        code == 0x0C || code == 0x1C || code == 0x1D || code == 0x1E ||
        code == 0x85 || code == 0x2028 || code == 0x2029
      if (isBreak) {
        out += s.substring(start, i)
        if (c == '\r' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
        i += 1; start = i
      } else i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  /** Python `len([w for w in text.strip().split() if w])` —
    * chunker.py:36-37. */
  private[extract] def pyCountWords(s: String): Int = {
    var i = 0; var count = 0; var inWord = false
    while (i < s.length) {
      if (pyIsSpace(s.charAt(i))) inWord = false
      else { if (!inWord) count += 1; inWord = true }
      i += 1
    }
    count
  }

  /** chunker.py:39-54: single-splitlines-line `< 15`-word heading first,
    * then `[-*+]` list at ratio ≥ 0.5, else paragraph — no code/quote. */
  private def detectTypeFastApi(text: String): String = {
    val lines = pySplitlines(pyStrip(text))
    if (lines.length == 1 && pyCountWords(text) < 15) "heading"
    else {
      val listLines = lines.count(l => listLineRe.matcher(pyStrip(l)).find())
      if (lines.nonEmpty && listLines.toDouble / lines.length >= 0.5) "list"
      else "paragraph"
    }
  }

  private val md5Local = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexDigits((d(i) >> 4) & 0xF)
      out(i * 2 + 1) = hexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** C2+C3+C5: paragraph split, greedy 500-word packing, md5-prefixed ids —
    * chunker.js:82-122 (the packing loop is line-identical across the
    * ports; `variant` selects the port's trim/word-count/type-detection
    * string semantics: class-chunker.php:95-142, chunker.py:57-103). */
  def chunkContent(html: String, url: String,
      variant: Variant = Variant.Express): Vector[AChunk] = {
    val text = cleanHtml(html)
    // PHP empty($content): "" AND the falsy string "0" yield no chunks
    if (text.isEmpty || (variant == Variant.Wp && text == "0"))
      return Vector.empty
    val trimF: String => String = variant match {
      case Variant.Express => jsTrim
      case Variant.Wp => phpTrim
      case Variant.FastApi => pyStrip
    }
    val wcF: String => Int = variant match {
      case Variant.Express => countWords
      case Variant.Wp => phpStrWordCount
      case Variant.FastApi => pyCountWords
    }
    // PHP array_filter (no callback) also drops a falsy "0" paragraph
    val keep: String => Boolean = variant match {
      case Variant.Wp => p => p.nonEmpty && p != "0"
      case _ => p => p.nonEmpty
    }
    val paragraphs = paraSplitRe.split(text, -1).map(trimF).filter(keep)
    if (paragraphs.isEmpty) return Vector.empty

    val chunkTexts = Vector.newBuilder[String]
    var current = ""
    var currentWords = 0
    paragraphs.foreach { para =>
      val paraWords = wcF(para)
      if (currentWords > 0 && currentWords + paraWords > WordsPerChunk) {
        chunkTexts += current
        current = para
        currentWords = paraWords
      } else {
        current = if (current.isEmpty) para else current + "\n\n" + para
        currentWords += paraWords
      }
    }
    if (current.nonEmpty) chunkTexts += current

    val idPrefix = md5Hex(url)
    chunkTexts.result().zipWithIndex.map { case (t, i) =>
      AChunk(s"${idPrefix}_$i", t, detectType(t, variant), relevance = None)
    }
  }

  /** C7: WordPress shortcode / block-comment strip —
    * `/root/reference/adapters/wordpress/includes/class-chunker.php:28-81`.
    * 14 noisy shortcode tags (with optional body up to the closing tag),
    * any remaining `[shortcode ...]` markers, and `<!-- wp:navigation -->`
    * style block comments. The transcript analog: tool-call wrapper markup
    * inside turn payloads. */
  private val stripShortcodes = Seq(
    "gallery", "embed", "video", "audio", "playlist", "caption", "ad",
    "adsense", "sidebar", "widget", "social", "share", "related_posts")
  private val shortcodeRes = stripShortcodes.map { tag =>
    val q = Pattern.quote(tag)
    Pattern.compile("\\[" + q + "[^\\]]*\\](?:.*?\\[/" + q + "\\])?", Pattern.DOTALL)
  }
  /** `strip_shortcodes` residue: any leftover [tag ...] / [/tag] markers. */
  private val anyShortcodeRe = Pattern.compile("\\[/?[a-zA-Z0-9_-]+[^\\]]*\\]")
  private val wpBlockCommentRe = Pattern.compile(
    "<!--\\s*wp:(navigation|widget|social-links|search|tag-cloud|categories|archives|calendar|rss|latest-comments)[\\s\\S]*?-->",
    Pattern.DOTALL)

  def stripWpNoise(content: String): String = {
    var c = content
    shortcodeRes.foreach(re => c = re.matcher(c).replaceAll(""))
    c = anyShortcodeRe.matcher(c).replaceAll("")
    c = wpBlockCommentRe.matcher(c).replaceAll("")
    c
  }

  /** WP-variant clean: shortcode strip then the common tag strip pipeline
    * (class-chunker.php:53-81). */
  def cleanWp(content: String): String = cleanHtml(stripWpNoise(content))

  /** C6: first ~40 words + "..." — chunker.js:131-136. */
  def summarise(html: String, words: Int = 40): String = {
    val text = cleanHtml(html)
    val wordList = wsSplitRe.split(text, -1).filter(_.nonEmpty)
    if (wordList.length <= words) text
    else wordList.take(words).mkString(" ") + "..."
  }
}
