package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import ChunkHtml.Chunk

/** Per-operator goldens beyond the reference's fixture suite, pinned to
  * the exact semantics of `/root/reference/sidecar/chunker.py` (E2-E7). */
class ChunkHtmlSpec extends AnyFunSuite {

  private def page(html: String) = ChunkHtml("https://t.example/x", html)

  // E2: strip tags (chunker.py:45,650-652)
  test("strip tags removes nav/header/footer/aside/script/style/ins/iframe/noscript subtrees") {
    val html =
      """<html><body><main>
        |<nav><p>This navigation paragraph should disappear entirely.</p></nav>
        |<header><p>This header paragraph should disappear entirely too.</p></header>
        |<footer><p>Footer paragraph that also must not survive the strip.</p></footer>
        |<aside><p>Aside paragraph that also must not survive the strip.</p></aside>
        |<ins><p>Inserted ad paragraph that must not survive the strip.</p></ins>
        |<noscript><p>Noscript content that must not survive the strip.</p></noscript>
        |<p>Only this real content paragraph remains after stripping.</p>
        |</main></body></html>""".stripMargin
    assert(page(html).chunks ==
      Vector(Chunk("Only this real content paragraph remains after stripping.", "paragraph")))
  }

  // E3: noise classes/ids/roles (chunker.py:48-51,69-78)
  test("noise class/id/role elements vanish; ad needs word boundary") {
    val html =
      """<html><body>
        |<div class="sidebar"><p>Sidebar content paragraph must disappear.</p></div>
        |<div id="cookie-banner"><p>Cookie banner paragraph must disappear.</p></div>
        |<div role="navigation"><p>Role navigation paragraph must disappear.</p></div>
        |<div role="banner"><p>Role banner paragraph must disappear now.</p></div>
        |<div role="complementary"><p>Role complementary paragraph must disappear.</p></div>
        |<div class="ad"><p>Class ad with boundary must disappear as well.</p></div>
        |<div class="ads-top"><p>Class ads- with boundary must disappear too.</p></div>
        |<div class="advertisement"><p>Advert substring class must disappear too.</p></div>
        |<div class="social share comment"><p>Social share comment must go away.</p></div>
        |<div class="newsletter popup modal promo menu"><p>More noise that must go.</p></div>
        |<div class="adjacent"><p>The adjacent class is NOT noise (no boundary after ad).</p></div>
        |<div class="gradient"><p>The gradient class is fine and must be kept here.</p></div>
        |<p>Plain surviving paragraph stays in the output.</p>
        |</body></html>""".stripMargin
    assert(page(html).chunks == Vector(
      Chunk("The adjacent class is NOT noise (no boundary after ad).", "paragraph"),
      Chunk("The gradient class is fine and must be kept here.", "paragraph"),
      Chunk("Plain surviving paragraph stays in the output.", "paragraph")))
  }

  // E4: root selection precedence main > article > body
  test("main preferred over article over body") {
    val html =
      """<html><body>
        |<p>Body-level paragraph outside main is not under the chosen root.</p>
        |<article><p>Article paragraph also not chosen when main exists.</p></article>
        |<main><p>Main paragraph is the only one extracted from this page.</p></main>
        |</body></html>""".stripMargin
    assert(page(html).chunks ==
      Vector(Chunk("Main paragraph is the only one extracted from this page.", "paragraph")))
  }

  // E6: type mapping + li folding + container skip + min length
  test("chunk typing: headings, lists, code, quote; li folded; <20 chars dropped") {
    val html =
      """<html><body><main>
        |<h2>A section heading with enough length</h2>
        |<ul><li>First bullet item here</li><li>Second bullet item here</li></ul>
        |<pre>  code with   spacing
        |  preserved exactly()  </pre>
        |<blockquote>A memorable quotation with sufficient length to keep.</blockquote>
        |<p>short one</p>
        |<p>A paragraph long enough to be emitted as a chunk.</p>
        |</main></body></html>""".stripMargin
    val got = page(html).chunks
    assert(got == Vector(
      Chunk("A section heading with enough length", "heading"),
      // bs4 get_text() concatenates text nodes with NO separator, so two
      // adjacent <li> with no whitespace between them fuse (reference quirk)
      Chunk("First bullet item hereSecond bullet item here", "list"),
      Chunk("code with   spacing\n  preserved exactly()", "code"),
      Chunk("A memorable quotation with sufficient length to keep.", "quote"),
      Chunk("A paragraph long enough to be emitted as a chunk.", "paragraph")))
  }

  // E6: dedup via seen_texts — first occurrence wins (chunker.py:668-670,699)
  test("duplicate text appears once") {
    val html =
      """<html><body>
        |<p>This exact duplicated paragraph text appears just once.</p>
        |<p>This exact duplicated paragraph text appears just once.</p>
        |<p>A different second paragraph is kept alongside the first.</p>
        |</body></html>""".stripMargin
    assert(page(html).chunks == Vector(
      Chunk("This exact duplicated paragraph text appears just once.", "paragraph"),
      Chunk("A different second paragraph is kept alongside the first.", "paragraph")))
  }

  // E7: long-chunk split (chunker.py:54,86-101)
  test("no chunk exceeds 1500 chars; split at sentence boundaries; packing greedy") {
    val sentence = "This sentence is exactly forty-seven chars long. " // 49 w/ trailing sp
    val text = (sentence * 80).trim // ~3900 chars
    val html = s"<html><body><p>$text</p></body></html>"
    val got = page(html).chunks
    assert(got.forall(_.chunkType == "paragraph"))
    assert(got.length > 1)
    assert(got.forall(c => TextUtil.cpLength(c.text) <= 1500))
    // reconstruction: joined output == input (single spaces preserved)
    assert(got.map(_.text).mkString(" ") == text)
    // greedy packing: each chunk except the last could not absorb one more sentence
    got.dropRight(1).foreach { c =>
      assert(TextUtil.cpLength(c.text) + 1 + 48 > 1500)
    }
  }

  test("exact 1500-char text is not split") {
    val t = ("word " * 300).trim // 1499 chars
    val text = t + "!" // 1500
    val html = s"<html><body><p>$text</p></body></html>"
    assert(page(html).chunks == Vector(Chunk(text, "paragraph")))
  }

  // E9: summary fallback chain (chunker.py:719-726)
  test("summary: no paragraphs → description → title") {
    val html1 =
      """<html><head><meta name="description" content="Fallback description."/>
        |<title>Fallback Title Here</title></head>
        |<body><h2>Only a heading with enough length</h2></body></html>""".stripMargin
    assert(page(html1).summary == "Fallback description.")
    val html2 = "<html><head><title>Only Title Here For Fallback</title></head>" +
      "<body><h2>Only a heading with enough length</h2></body></html>"
    assert(page(html2).summary == "Only Title Here For Fallback")
  }

  test("summary caps at 500 chars, stops after 300") {
    val p1 = "Alpha " * 40 // 240 chars trimmed 239
    val p2 = "Beta " * 40
    val p3 = "Gamma " * 40
    val html = s"<html><body><p>${p1.trim}</p><p>${p2.trim}</p><p>${p3.trim}</p></body></html>"
    val s = page(html).summary
    // joined p1+p2 exceeds 300 → stop; p3 never added
    assert(s == (p1.trim + " " + p2.trim).take(500))
    assert(!s.contains("Gamma") || s.length == 500)
  }

  // E11: language detection (chunker.py:585-592)
  test("language: primary-region normalization") {
    def lang(l: String) = {
      val attr = if (l.isEmpty) "" else s""" lang="$l""""
      ChunkHtml("u", s"<html$attr><body><p>Twenty characters of content here.</p></body></html>").language
    }
    assert(lang("fr-CA") == "fr-CA")
    assert(lang("en") == "en")
    assert(lang("pt-BR-x-priv") == "pt-BR")
    assert(lang("") == "en")
  }

  // E10: h1 overrides <title> when no rich meta title
  test("title: h1 wins over <title>") {
    val html = "<html><head><title>Doc Title Tag</title></head>" +
      "<body><h1>The H1 Wins Title</h1><p>Body paragraph with enough text here.</p></body></html>"
    assert(page(html).title == "The H1 Wins Title")
  }

  // E12: updated pinned to provided ts, never wall-clock
  test("updated comes from caller") {
    val p = ChunkHtml("u", "<html><body><p>Some content paragraph here ok.</p></body></html>",
      Some("2026-01-01T00:00:00+00:00"))
    assert(p.updated.contains("2026-01-01T00:00:00+00:00"))
  }

  // E5: whitespace collapse incl. nbsp (Python \s parity)
  test("clean text collapses unicode whitespace including nbsp") {
    val html = "<html><body><p>Alpha&nbsp;&nbsp;beta gamma\t\n delta epsilon zeta.</p></body></html>"
    assert(page(html).chunks.head.text == "Alpha beta gamma delta epsilon zeta.")
  }

  // plain-text / markdown payloads (lxml wraps stray text in <p>)
  test("bare text payload becomes one paragraph chunk") {
    val text = "Markdown-ish plain payload with no tags but plenty of words to chunk."
    assert(ChunkHtml("u", text).chunks == Vector(Chunk(text, "paragraph")))
  }

  test("markdown payload with inline code and newlines") {
    val text = "Line one of the transcript turn.\nLine two continues the thought in detail."
    val got = ChunkHtml("u", text).chunks
    assert(got == Vector(Chunk(
      "Line one of the transcript turn. Line two continues the thought in detail.",
      "paragraph")))
  }
}
