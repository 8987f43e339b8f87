package graft.extract

import java.util.regex.Pattern

/** The cross-adapter "canonical" ~500-word chunker, identical across the
  * reference's 9 framework ports. Semantics follow the Express adapter
  * (superset variant): `/root/reference/adapters/express/src/chunker.js:12-136`
  * (constants :12, cleanHtml :19-34, countWords :40-42, detectType :48-73,
  * chunkContent :82-122, summarise :131-136).
  */
object AdapterChunker {

  val WordsPerChunk = 500

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
    * chunker.js:82-122. */
  def chunkContent(html: String, url: String): Vector[AChunk] = {
    val text = cleanHtml(html)
    if (text.isEmpty) return Vector.empty
    val paragraphs = paraSplitRe.split(text, -1).map(jsTrim).filter(_.nonEmpty)
    if (paragraphs.isEmpty) return Vector.empty

    val chunkTexts = Vector.newBuilder[String]
    var current = ""
    var currentWords = 0
    paragraphs.foreach { para =>
      val paraWords = countWords(para)
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
      AChunk(s"${idPrefix}_$i", t, detectType(t), relevance = None)
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
