package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import ChunkHtml.Chunk

/** Edge cases pinned to the reference's exact control flow — each test
  * comments the chunker.py lines whose interplay it checks. */
class EdgeCaseSpec extends AnyFunSuite {

  private def page(html: String) = ChunkHtml("https://t.example/x", html)
  private def meta(html: String) = MetaExtract.extractMetadata(html, HtmlDom.parse(html))

  test("h1 inside <header> still wins the title: resolution runs PRE-strip") {
    // chunker.py: _extract_html_meta h1 lookup (:494-496) and chunk_html
    // title fallback (:639-644) both run on the un-stripped soup; the strip
    // at :650-654 happens later. So a header-only h1 sets the title even
    // though its content never chunks.
    val html =
      """<html><head><title>Doc Title</title></head><body>
        |<header><h1>Header H1 Title</h1></header>
        |<p>Body paragraph long enough to produce a chunk here.</p>
        |</body></html>""".stripMargin
    val p = page(html)
    assert(p.title == "Header H1 Title")
    assert(p.chunks == Vector(
      Chunk("Body paragraph long enough to produce a chunk here.", "paragraph")))
  }

  test("tag-soup page extracts with document-order text intact") {
    // mis-nested formatting + stray table text + unmatched closes: the
    // libxml2-style recovery (close-to-matching-open, no adoption agency,
    // no foster parenting) keeps every character in document order, so the
    // paragraph chunk text is exactly the cleaned source text.
    val html =
      """<html><body>
        |<p>alpha <b>bold run <i>both styles</b> italic tail</i> and the ending</p>
        |<table><tr><td>cell one</td></tr>stray<tr><td>cell two</td></tr></table>
        |<p>second paragraph long enough</em></strong> to emit a chunk</p>
        |</body></html>""".stripMargin
    val p = page(html)
    assert(p.chunks == Vector(
      Chunk("alpha bold run both styles italic tail and the ending", "paragraph"),
      Chunk("second paragraph long enough to emit a chunk", "paragraph")))
  }

  test("main inside a noise div is decomposed; root falls back to body") {
    // strip (:650-654) runs before root selection (:657-659)
    val html =
      """<html><body>
        |<div class="sidebar"><main><p>Main inside sidebar disappears entirely.</p></main></div>
        |<p>Body fallback paragraph is what gets extracted.</p>
        |</body></html>""".stripMargin
    assert(page(html).chunks ==
      Vector(Chunk("Body fallback paragraph is what gets extracted.", "paragraph")))
  }

  test("invalid JSON-LD block is skipped; falls through to OpenGraph") {
    // _extract_jsonld json.loads failure -> continue (:378-381)
    val html =
      """<html><head>
        |<script type="application/ld+json">{not valid json}</script>
        |<meta property="og:title" content="OG Wins" />
        |<meta property="og:description" content="desc" />
        |</head><body><p>Some body paragraph with enough length.</p></body></html>""".stripMargin
    val m = meta(html)
    assert(m.title.pyStr == "OG Wins")
    assert(m.schemaType == JNull)
  }

  test("multiple JSON-LD blocks: priority type wins over document order") {
    // priority loop (:396-407): Recipe outranks Article even if later
    val html =
      """<html><head>
        |<script type="application/ld+json">{"@type":"Article","headline":"The Article"}</script>
        |<script type="application/ld+json">{"@type":"Recipe","name":"The Recipe"}</script>
        |</head><body></body></html>""".stripMargin
    val m = meta(html)
    assert(m.metaType.pyStr == "recipe")
    assert(m.title.pyStr == "The Recipe")
  }

  test("@graph flattening picks typed item") {
    val html =
      """<html><head><script type="application/ld+json">
        |{"@context":"x","@graph":[
        |  {"@type":"WebSite","name":"Site"},
        |  {"@type":"BlogPosting","headline":"Post Headline","articleSection":"S"}]}
        |</script></head><body></body></html>""".stripMargin
    val m = meta(html)
    assert(m.title.pyStr == "Post Headline")
    assert(m.schemaType.pyStr == "BlogPosting")
    assert(m.metaType.pyStr == "article")
  }

  test("@type as list dispatches on first mapped entry") {
    val html =
      """<html><head><script type="application/ld+json">
        |{"@type":["Thing","Product"],"name":"P","offers":{"price":"9.99","priceCurrency":"EUR"}}
        |</script></head><body></body></html>""".stripMargin
    val m = meta(html)
    assert(m.metaType.pyStr == "product")
    assert(m.extraGet("price").pyStr == "9.99")
    assert(m.extraGet("currency").pyStr == "EUR")
  }

  test("JSON-LD blanks filled from OpenGraph (:558-562)") {
    val html =
      """<html><head>
        |<script type="application/ld+json">{"@type":"Article","headline":"LD Title"}</script>
        |<meta property="og:description" content="OG description fills blank" />
        |<meta property="og:image" content="https://e.com/og.jpg" />
        |<meta property="og:title" content="OG Title (must NOT override LD)" />
        |</head><body></body></html>""".stripMargin
    val m = meta(html)
    assert(m.title.pyStr == "LD Title")
    assert(m.description.pyStr == "OG description fills blank")
    assert(m.image.pyStr == "https://e.com/og.jpg")
  }

  test("OG blanks filled from HTML meta; og:type drives type") {
    val html =
      """<html><head>
        |<title>HT Title</title>
        |<meta property="og:image" content="https://e.com/i.jpg" />
        |<meta property="og:type" content="video" />
        |<meta name="description" content="HTML desc fills OG blank" />
        |<meta name="author" content="HTML Author" />
        |</head><body></body></html>""".stripMargin
    val m = meta(html) // og has image only -> non-empty -> fill from html
    assert(m.metaType.pyStr == "video")
    assert(m.title.pyStr == "HT Title")
    assert(m.description.pyStr == "HTML desc fills OG blank")
    assert(m.author.pyStr == "HTML Author")
    assert(m.image.pyStr == "https://e.com/i.jpg")
  }

  test("author list joins with comma; dict uses @id fallback") {
    assert(MetaExtract.extractAuthor(JsonLite.parse(
      """[{"name":"A"},{"@id":"B"},"C"]""").get).pyStr == "A, B, C")
    assert(MetaExtract.extractAuthor(JsonLite.parse("""{"x":1}""").get) == JNull)
    assert(MetaExtract.extractAuthor(JNum(5, "5")) == JNull) // non-str scalar -> None
  }

  test("recipe: reviewCount used only when ratingCount absent (:216-220)") {
    def recipeMeta(agg: String) = MetaExtract.mapRecipe(
      JsonLite.parse(s"""{"@type":"Recipe","name":"R","aggregateRating":$agg}""")
        .get.asInstanceOf[JObj])
    assert(recipeMeta("""{"ratingCount":"10","reviewCount":"99"}""")
      .extraGet("rating_count").pyStr == "10")
    assert(recipeMeta("""{"reviewCount":"99"}""")
      .extraGet("rating_count").pyStr == "99")
  }

  test("recipe injection position quirk: truthiness, not insertion (:716)") {
    // ingredients is a truthy non-list -> NO ingredients chunk, but the
    // instructions chunk still inserts at position 1
    val html =
      """<html><body><main>
        |<h1>Recipe page heading here ok</h1>
        |<script type="application/ld+json">x</script>
        |</main></body></html>""".stripMargin
    // craft via direct meta: simulate with mapRecipe over handcrafted ld
    val ld = JsonLite.parse(
      """{"@type":"Recipe","name":"R","recipeIngredient":"one string not a list",
        |"recipeInstructions":["step one","step two"]}""".stripMargin).get.asInstanceOf[JObj]
    val m = MetaExtract.mapRecipe(ld)
    assert(m.extraGet("ingredients") == JStr("one string not a list"))
    val full =
      s"""<html><head><script type="application/ld+json">
         |{"@type":"Recipe","name":"R","recipeIngredient":"one string not a list",
         |"recipeInstructions":["step one","step two"]}
         |</script></head><body><main>
         |<p>First paragraph with enough length to become chunk zero.</p>
         |</main></body></html>""".stripMargin
    val p = page(full)
    // instructions at index 1 (after the paragraph!) because insert_pos=1
    assert(p.chunks(0).chunkType == "paragraph")
    assert(p.chunks(1).chunkType == "instructions")
    assert(p.chunks(1).text == "Instructions:\n1. step one\n2. step two")
  }

  test("duplicate heading vs paragraph text: dedup is text-based across types") {
    // seen_texts keyed by text only (:670): same text as h2 then p emits once
    val t = "Identical text appearing in two different elements."
    val html = s"<html><body><h2>$t</h2><p>$t</p></body></html>"
    assert(page(html).chunks == Vector(Chunk(t, "heading")))
  }

  test("nested blockquote > p emits both (different texts after nesting)") {
    val html =
      """<html><body>
        |<blockquote>Outer quote intro: <p>inner paragraph inside the quote block</p></blockquote>
        |</body></html>""".stripMargin
    val got = page(html).chunks
    assert(got.map(_.chunkType) == Vector("quote", "paragraph"))
    assert(got(0).text == "Outer quote intro: inner paragraph inside the quote block")
    assert(got(1).text == "inner paragraph inside the quote block")
  }

  test("keywords: string splits on comma; list stringifies elements") {
    assert(MetaExtract.extractKeywords(JStr(" a , b ,, c ")) == Vector("a", "b", "c"))
    assert(MetaExtract.extractKeywords(JsonLite.parse("""["x", 5, " y "]""").get) ==
      Vector("x", "5", "y"))
    assert(MetaExtract.extractKeywords(JNum(3, "3")) == Vector.empty)
  }

  test("published falls to <time datetime> only when meta attrs absent") {
    val html =
      """<html><head><meta name="date" content="2024-02-02" /></head>
        |<body><time datetime="2023-01-01">old</time></body></html>""".stripMargin
    assert(meta(html).published.pyStr == "2024-02-02")
    val html2 = """<html><body><time datetime="2023-01-01">x</time></body></html>"""
    assert(meta(html2).published.pyStr == "2023-01-01")
  }

  test("script inside main never leaks into chunks") {
    val html =
      """<html><body><main>
        |<p>Visible paragraph content that should be extracted.</p>
        |<script>var leaked = "this script text must never appear anywhere";</script>
        |</main></body></html>""".stripMargin
    val p = page(html)
    assert(p.chunks.forall(!_.text.contains("leaked")))
    assert(p.chunks.length == 1)
  }
}
