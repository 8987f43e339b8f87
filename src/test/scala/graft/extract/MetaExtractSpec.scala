package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import Fixtures._
import MetaExtract.Meta

/** Port of every assertion in `/root/reference/sidecar/test_chunker.py:147-273`
  * (Tests 1-5). This is the correctness gate for per-turn text equality.
  */
class MetaExtractSpec extends AnyFunSuite {

  private def meta(html: String): Meta =
    MetaExtract.extractMetadata(html, HtmlDom.parse(html))

  private def str(v: JVal): String = v match {
    case JStr(s) => s
    case other => other.pyStr
  }

  // ── Test 1: Recipe with single-quote JSON-LD ──────────────────────
  test("recipe: type is recipe") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).metaType) == "recipe")
  }
  test("recipe: title") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).title) == "Pâté chinois classique")
  }
  test("recipe: author from Person object") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).author) == "Ricardo Larrivée")
  }
  test("recipe: published") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).published) == "2023-05-15")
  }
  test("recipe: keywords is list of 3") {
    assert(meta(RECIPE_HTML_SINGLE_QUOTE).keywords ==
      Vector("pâté chinois", "québécois", "classique"))
  }
  test("recipe: schema_type") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).schemaType) == "Recipe")
  }
  test("recipe: ingredients count 3") {
    val m = meta(RECIPE_HTML_SINGLE_QUOTE)
    m.extraGet("ingredients") match {
      case JArr(xs) => assert(xs.length == 3)
      case other => fail(s"got $other")
    }
  }
  test("recipe: instructions flattened >= 4") {
    val m = meta(RECIPE_HTML_SINGLE_QUOTE)
    m.extraGet("instructions") match {
      case JArr(xs) => assert(xs.length >= 4)
      case other => fail(s"got $other")
    }
  }
  test("recipe: section header in instructions") {
    val m = meta(RECIPE_HTML_SINGLE_QUOTE)
    val instr = m.extraGet("instructions") match {
      case JArr(xs) => xs.map(_.pyStr); case _ => Vector.empty[String]
    }
    assert(instr.exists(_.contains("Préparation de la viande")))
    // exact flattening semantics (chunker.py:158-185)
    assert(instr == Vector(
      "## Préparation de la viande",
      "Faire revenir le boeuf haché.",
      "Assaisonner avec sel et poivre.",
      "Étaler le maïs en crème sur la viande.",
      "Couvrir de purée de pommes de terre."))
  }
  test("recipe: prepTime parsed") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("prepTime")) == "20 min")
  }
  test("recipe: cookTime parsed") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("cookTime")) == "45 min")
  }
  test("recipe: totalTime parsed") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("totalTime")) == "1h 5 min")
  }
  test("recipe: rating") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("rating")) == "4.8")
  }
  test("recipe: rating_count") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("rating_count")) == "1250")
  }
  test("recipe: category") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("category")) == "Plat principal")
  }
  test("recipe: yield") {
    assert(str(meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("yield")) == "6 portions")
  }
  test("recipe: sub_categories (Ricardo ext)") {
    meta(RECIPE_HTML_SINGLE_QUOTE).extraGet("sub_categories") match {
      case JArr(xs) => assert(xs.map(_.pyStr) == Vector("Comfort food", "Traditionnel"))
      case other => fail(s"got $other")
    }
  }
  test("recipe: chunk_html produces ingredients + instructions chunks") {
    val page = ChunkHtml("https://www.ricardo.ca/pate-chinois", RECIPE_HTML_SINGLE_QUOTE)
    val types = page.chunks.map(_.chunkType)
    assert(types.contains("ingredients"), s"types: $types")
    assert(types.contains("instructions"), s"types: $types")
    assert(str(page.metadata.metaType) == "recipe")
  }
  test("recipe: exact injected chunk text (chunker.py:702-717)") {
    val page = ChunkHtml("https://www.ricardo.ca/pate-chinois", RECIPE_HTML_SINGLE_QUOTE)
    assert(page.chunks(0).text ==
      "Ingredients:\n- 1 lb boeuf haché\n- 1 boîte de maïs en crème\n- 4 pommes de terre")
    assert(page.chunks(0).chunkType == "ingredients")
    assert(page.chunks(1).text ==
      "Instructions:\n1. ## Préparation de la viande\n2. Faire revenir le boeuf haché.\n" +
        "3. Assaisonner avec sel et poivre.\n4. Étaler le maïs en crème sur la viande.\n" +
        "5. Couvrir de purée de pommes de terre.")
    assert(page.chunks(1).chunkType == "instructions")
  }
  test("recipe: body chunks + language fr-CA + stable full output") {
    val page = ChunkHtml("https://www.ricardo.ca/pate-chinois", RECIPE_HTML_SINGLE_QUOTE)
    assert(page.language == "fr-CA")
    assert(page.title == "Pâté chinois classique")
    // body: h1 text is 22 cp (>=20) → heading chunk; p → paragraph chunk
    val body = page.chunks.drop(2)
    assert(body == Vector(
      ChunkHtml.Chunk("Pâté chinois classique", "heading"),
      ChunkHtml.Chunk(
        "La meilleure recette de pâté chinois, un classique québécois réconfortant pour toute la famille.",
        "paragraph")))
    assert(page.summary ==
      "La meilleure recette de pâté chinois, un classique québécois réconfortant pour toute la famille.")
  }

  // ── Test 2: Article with double-quote JSON-LD ─────────────────────
  test("article: type is article") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).metaType) == "article")
  }
  test("article: title from headline") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).title) ==
      "The AI Revolution Is Here and It's Weirder Than You Think")
  }
  test("article: author") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).author) == "Jane Doe")
  }
  test("article: published") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).published) == "2025-03-10T14:00:00Z")
  }
  test("article: modified") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).modified) == "2025-03-11T09:30:00Z")
  }
  test("article: keywords is list of 3") {
    assert(meta(ARTICLE_HTML_DOUBLE_QUOTE).keywords == Vector("AI", "technology", "future"))
  }
  test("article: schema_type is NewsArticle") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).schemaType) == "NewsArticle")
  }
  test("article: articleSection in extra") {
    assert(str(meta(ARTICLE_HTML_DOUBLE_QUOTE).extraGet("articleSection")) == "Technology")
  }
  test("article: chunk_html title from JSON-LD + author") {
    val page = ChunkHtml("https://sketchynews.snaf.foo/ai-revolution", ARTICLE_HTML_DOUBLE_QUOTE)
    assert(page.title == "The AI Revolution Is Here and It's Weirder Than You Think")
    assert(page.author.contains("Jane Doe"))
  }
  test("article: full chunk list and summary") {
    val page = ChunkHtml("https://sketchynews.snaf.foo/ai-revolution", ARTICLE_HTML_DOUBLE_QUOTE)
    assert(page.chunks == Vector(
      ChunkHtml.Chunk("The AI Revolution Is Here", "heading"),
      ChunkHtml.Chunk(
        "Artificial intelligence is transforming every industry at an unprecedented pace, from healthcare to finance.",
        "paragraph"),
      ChunkHtml.Chunk(
        "Experts predict that by 2030, AI will be integrated into nearly every aspect of daily life.",
        "paragraph")))
    assert(page.language == "en")
    assert(page.published.contains("2025-03-10T14:00:00Z"))
  }

  // ── Test 3: OpenGraph only (no JSON-LD) ───────────────────────────
  test("og: title from og:title") {
    assert(str(meta(OPENGRAPH_ONLY_HTML).title) == "The Real OG Title")
  }
  test("og: description from og:description") {
    assert(str(meta(OPENGRAPH_ONLY_HTML).description) == "This page only has OpenGraph tags.")
  }
  test("og: image") {
    assert(str(meta(OPENGRAPH_ONLY_HTML).image) == "https://example.com/image.jpg")
  }
  test("og: author from article:author") {
    assert(str(meta(OPENGRAPH_ONLY_HTML).author) == "OG Author")
  }
  test("og: published from article:published_time") {
    assert(str(meta(OPENGRAPH_ONLY_HTML).published) == "2024-12-01T10:00:00Z")
  }
  test("og: keywords from article:tag") {
    assert(meta(OPENGRAPH_ONLY_HTML).keywords == Vector("test", "opengraph"))
  }
  test("og: schema_type is None (no JSON-LD)") {
    assert(meta(OPENGRAPH_ONLY_HTML).schemaType == JNull)
  }
  test("og: type from og:type") {
    assert(str(meta(OPENGRAPH_ONLY_HTML).metaType) == "article")
  }
  test("og: chunk_html uses OG title") {
    val page = ChunkHtml("https://example.com/og-page", OPENGRAPH_ONLY_HTML)
    assert(page.title == "The Real OG Title")
  }

  // ── Test 4: No metadata at all (pure HTML) ────────────────────────
  test("plain: title from h1") {
    assert(str(meta(PLAIN_HTML).title) == "Welcome to the Plain Page")
  }
  test("plain: description from meta") {
    assert(str(meta(PLAIN_HTML).description) == "A simple page with no structured metadata.")
  }
  test("plain: author from meta") {
    assert(str(meta(PLAIN_HTML).author) == "Plain Author")
  }
  test("plain: type is page") {
    assert(str(meta(PLAIN_HTML).metaType) == "page")
  }
  test("plain: keywords is empty list") {
    assert(meta(PLAIN_HTML).keywords.isEmpty)
  }
  test("plain: chunk_html backward compat") {
    val page = ChunkHtml("https://example.com/plain", PLAIN_HTML)
    assert(page.chunks.nonEmpty, s"got ${page.chunks.length} chunks")
    assert(page.title == "Welcome to the Plain Page")
    assert(page.author.contains("Plain Author"))
    assert(page.language == "en") // default when <html> has no lang
    assert(page.chunks == Vector(
      ChunkHtml.Chunk("Welcome to the Plain Page", "heading"),
      ChunkHtml.Chunk(
        "This is a completely plain HTML page with no JSON-LD and no OpenGraph tags. Only basic HTML metadata.",
        "paragraph")))
  }

  // ── Test 5: parse_iso_duration ────────────────────────────────────
  test("iso duration table") {
    assert(TextUtil.parseIsoDuration("PT25M") == "25 min")
    assert(TextUtil.parseIsoDuration("PT1H30M") == "1h 30 min")
    assert(TextUtil.parseIsoDuration("P1DT2H") == "1d 2h")
    assert(TextUtil.parseIsoDuration("PT1H") == "1h")
    assert(TextUtil.parseIsoDuration("PT45S") == "45s")
    assert(TextUtil.parseIsoDuration("PT1H5M") == "1h 5 min")
    assert(TextUtil.parseIsoDuration("") == "")
    // Python int() is arbitrary precision: a pathological 20+-digit payload
    // must humanize, not throw NumberFormatException inside mapPartitions
    assert(TextUtil.parseIsoDuration("PT99999999999999999999S")
      == "99999999999999999999s")
    assert(TextUtil.parseIsoDuration("garbage") == "garbage") // unparseable → raw
    assert(TextUtil.parseIsoDuration("P0DT0H0M0S") == "P0DT0H0M0S") // all-zero → raw
  }
}
