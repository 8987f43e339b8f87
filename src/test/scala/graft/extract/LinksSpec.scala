package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** S3 link extraction — `/root/reference/sidecar/crawler.py:43-98`. */
class LinksSpec extends AnyFunSuite {

  test("extract, resolve, normalise, same-origin, skip extensions") {
    val html =
      """<html><body>
        |<a href="/about/">About</a>
        |<a href="contact">Contact</a>
        |<a href="https://example.com/deep/page/#frag">Deep</a>
        |<a href="https://other.com/external">External</a>
        |<a href="/logo.png">Logo</a>
        |<a href="/styles.css">CSS</a>
        |<a href="/doc.PDF">Pdf</a>
        |<a name="anchor-without-href">n/a</a>
        |<a href="/about/">About dup</a>
        |</body></html>""".stripMargin
    val links = Links.extractLinks(html, "https://example.com/blog/post")
    assert(links == Vector(
      "https://example.com/about",          // trailing / stripped (4 slashes)
      "https://example.com/blog/contact",   // relative resolution
      "https://example.com/deep/page",      // defrag + trailing strip
      "https://example.com/about"))         // duplicates preserved (visited-set dedups)
  }

  test("normaliseUrl: rstrip only when more than 3 slashes") {
    assert(Links.normaliseUrl("https://e.com/") == "https://e.com/") // 3 slashes: kept
    assert(Links.normaliseUrl("https://e.com/a/") == "https://e.com/a")
    assert(Links.normaliseUrl("https://e.com/a//") == "https://e.com/a")
    assert(Links.normaliseUrl("https://e.com/a#x") == "https://e.com/a")
  }
}
