package graft.extract

/** sitemap.xml parsing (S2), pinned to what the reference actually does —
  * `/root/reference/sidecar/crawler.py:63-81`: ElementTree parse, then
  * `findall("sm:sitemap/sm:loc")` (index entries → recursively fetched)
  * and `findall("sm:url/sm:loc")` (page urls), namespace
  * `http://www.sitemaps.org/schemas/sitemap/0.9`, `.text.strip()`.
  * The fetch/recursion is the network side (out of scope); this is the
  * pure parse: one document in → its direct-child loc entries out, each
  * tagged `url` or `sitemap` so a driver loop can recurse exactly like
  * the reference.
  *
  * ElementTree behaviors mirrored (verified against CPython):
  *  - namespace-AWARE: a sitemap without the 0.9 xmlns yields NO entries;
  *    default (`xmlns=`) and prefixed (`xmlns:sm=`) declarations both
  *    resolve, including declarations on the element itself
  *  - only DIRECT children of the root count (`sm:url/sm:loc` is a
  *    two-step child path, not a descendant search)
  *  - `.text` = text before the first child element; CDATA is literal
  *    (no entity expansion inside), regular text expands the five XML
  *    entities + numeric character references
  *  - malformed XML → ElementTree raises and the crawler's try/except
  *    returns the empty list; parse mirrors that with an empty result
  */
object Sitemap {

  val Ns = "http://www.sitemaps.org/schemas/sitemap/0.9"

  /** kind: "url" (page) or "sitemap" (index entry to recurse into). */
  final case class Entry(kind: String, loc: String)

  private val TagRe = java.util.regex.Pattern.compile(
    """<(/?)([A-Za-z_][\w.\-]*(?::[\w.\-]+)?)((?:"[^"]*"|'[^']*'|[^<>"'])*?)(/?)>""")
  private val AttrRe = java.util.regex.Pattern.compile(
    """([A-Za-z_][\w.\-]*(?::[\w.\-]+)?)\s*=\s*("([^"]*)"|'([^']*)')""")

  private def decodeXmlText(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i) {
          val name = s.substring(i + 1, semi)
          val rep = name match {
            case "amp" => Some("&"); case "lt" => Some("<"); case "gt" => Some(">")
            case "quot" => Some("\""); case "apos" => Some("'")
            case n if n.startsWith("#x") || n.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(n.drop(2), 16))))
              catch { case _: Exception => None }
            case n if n.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(n.drop(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def parse(xml: String): Vector[Entry] =
    try parseStrict(xml)
    catch { case _: Exception => Vector.empty } // crawler.py:80 catch-all

  private def parseStrict(xml: String): Vector[Entry] = {
    // strip prolog / comments / doctype before tag scanning; CDATA is
    // substituted with placeholders so its content never parses as markup
    var cdatas = Vector.empty[String]
    val noCdata = {
      val sb = new StringBuilder
      var i = 0
      while (i < xml.length) {
        val start = xml.indexOf("<![CDATA[", i)
        if (start < 0) { sb.append(xml.substring(i)); i = xml.length }
        else {
          val end = xml.indexOf("]]>", start + 9)
          if (end < 0) throw new IllegalArgumentException("unterminated CDATA")
          sb.append(xml.substring(i, start))
          sb.append("\u0000").append(cdatas.length).append('\u0000')
          cdatas :+= xml.substring(start + 9, end)
          i = end + 3
        }
      }
      sb.toString
    }
    val cleaned = noCdata
      .replaceAll("(?s)<\\?.*?\\?>", "")
      .replaceAll("(?s)<!--.*?-->", "")
      .replaceAll("(?s)<!DOCTYPE[^>]*>", "")

    final case class Frame(uri: String, local: String, ns: Map[String, String])
    var stack = List.empty[Frame]
    var out = Vector.empty[Entry]
    var rootOk = false
    // text accumulated for a direct loc child, while no child element seen
    var locText: StringBuilder = null
    var locKind: String = null

    def resolveCdata(t: String): String = {
      // placeholders back to literal CDATA content; entity-decode only the
      // non-CDATA segments (ElementTree semantics)
      val parts = t.split('\u0000')
      val sb = new StringBuilder
      // placeholders alternate with text: odd indices are cdata ordinals
      parts.zipWithIndex.foreach { case (p, i) =>
        if (i % 2 == 1) sb.append(cdatas(p.toInt))
        else sb.append(decodeXmlText(p))
      }
      sb.toString
    }

    val m = TagRe.matcher(cleaned)
    var pos = 0
    while (m.find()) {
      val text = cleaned.substring(pos, m.start())
      if (locText != null) locText.append(text)
      pos = m.end()
      val closing = m.group(1) == "/"
      val rawName = m.group(2)
      val attrs = m.group(3)
      val selfClose = m.group(4) == "/"

      if (closing) {
        val localClose = rawName.substring(rawName.indexOf(':') + 1)
        if (stack.isEmpty || localClose != stack.head.local)
          throw new IllegalArgumentException(
            s"mismatched close </$rawName>, expected </${stack.headOption.map(_.local).getOrElse("<none>")}>")
        // emit on closing a tracked loc
        if (locText != null && stack.size == 3) {
          out :+= Entry(locKind, resolveCdata(locText.toString).trim)
          locText = null; locKind = null
        }
        stack = stack.tail
      } else {
        val inherited = stack.headOption.map(_.ns).getOrElse(Map.empty[String, String])
        var ns = inherited
        val am = AttrRe.matcher(attrs)
        while (am.find()) {
          val an = am.group(1)
          val av = decodeXmlText(Option(am.group(3)).getOrElse(am.group(4)))
          if (an == "xmlns") ns += ("" -> av)
          else if (an.startsWith("xmlns:")) ns += (an.drop(6) -> av)
        }
        val (prefix, local) = rawName.indexOf(':') match {
          case -1 => ("", rawName)
          case i => (rawName.substring(0, i), rawName.substring(i + 1))
        }
        val uri = ns.getOrElse(prefix,
          if (prefix.isEmpty) "" else throw new IllegalArgumentException(s"unbound prefix $prefix"))

        if (stack.isEmpty) {
          rootOk = uri == Ns && (local == "urlset" || local == "sitemapindex")
        } else if (rootOk && stack.size == 2 && local == "loc" && uri == Ns &&
            (stack.head.local == "url" || stack.head.local == "sitemap") &&
            stack.head.uri == Ns && !selfClose) {
          locText = new StringBuilder
          locKind = if (stack.head.local == "url") "url" else "sitemap"
        } else if (locText != null) {
          // a child element inside loc ends ElementTree's `.text`
          locText = null; locKind = null
        }

        if (!selfClose) stack = Frame(uri, local, ns) :: stack
      }
    }
    if (stack.nonEmpty) throw new IllegalArgumentException("unclosed elements")
    out
  }
}
