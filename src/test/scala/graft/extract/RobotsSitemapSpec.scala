package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Robots (S4) + Sitemap (S2) parsing, pinned against CPython's
  * urllib.robotparser / xml.etree.ElementTree outputs (the exact libraries
  * the reference crawler uses — crawler.py:63-81,101-127). Every expected
  * value below was produced by running the Python originals. */
class RobotsSitemapSpec extends AnyFunSuite {

  private val robotsTxt =
    """# comment
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /tmp
      |
      |User-agent: OpenFeeder-Sidecar
      |Disallow: /search
      |Allow: /search/docs
      |Disallow:
      |
      |User-agent: BadBot
      |Disallow: /
      |""".stripMargin

  private val rules = Robots.parse(robotsTxt)

  test("robots: pinned can_fetch matrix from urllib.robotparser") {
    val expect = Seq(
      ("OpenFeeder-Sidecar", "http://x/search", false),
      // first-match-wins in FILE order: the later Allow /search/docs is
      // dead behind Disallow /search (urllib has no longest-match)
      ("OpenFeeder-Sidecar", "http://x/search/docs", false),
      ("OpenFeeder-Sidecar", "http://x/searchXtra", false), // prefix, no boundary
      ("OpenFeeder-Sidecar", "http://x/private/", true), // named group shadows *
      ("OpenFeeder-Sidecar", "http://x/anything", true),
      ("OpenFeeder-Sidecar/1.0", "http://x/search", false), // agent split('/')
      ("openfeeder-sidecar", "http://x/search", false), // case-insensitive
      ("SomeBot", "http://x/private/a", false),
      ("SomeBot", "http://x/private/public/a", false), // Allow dead behind Disallow
      ("SomeBot", "http://x/tmpfile", false),
      ("SomeBot", "http://x/ok", true),
      ("BadBot", "http://x/ok", false),
      ("SomeBot", "http://x/private/pub%6Cic/a", false), // %-decode normalizes
      ("SomeBot", "http://x/a b", true), // re-quoted to /a%20b, no rule
      ("SomeBot", "http://x/", true),
      ("SomeBot", "http://x", true)) // empty path -> "/"
    expect.foreach { case (agent, url, want) =>
      assert(rules.canFetch(agent, url) == want, s"$agent $url")
    }
  }

  test("robots: url normalization matches urlparse for scheme/authority edges") {
    // every expectation below pinned against urllib.robotparser/urlparse
    assert(!rules.canFetch("SomeBot", "//host/private/a")) // protocol-relative
    assert(!rules.canFetch("SomeBot", "HTTPS://host/private/a")) // scheme case
    assert(rules.canFetch("SomeBot", "http://host?q=1")) // authority ends at '?'
    assert(rules.canFetch("SomeBot", "http://host#frag"))
    assert(rules.canFetch("SomeBot", "relative/private/x")) // no leading '/'
    assert(rules.canFetch("SomeBot", "mailto:x@y/private/a")) // scheme, no '//'
    assert(Robots.normalizeUrl("//host/p") == "/p")
    assert(Robots.normalizeUrl("http://host?q=1") == "%3Fq%3D1")
    assert(Robots.normalizeUrl("mailto:x@y/p") == "x%40y/p")
    assert(Robots.normalizeUrl("relative/p") == "relative/p")
  }

  test("robots: empty content allows everything; unmatched agent falls to *") {
    assert(Robots.parse("").canFetch("AnyBot", "http://x/anything"))
    assert(!rules.canFetch("SomeBot", "/private/x"))
  }

  test("robots: crawl-delay and sitemaps are captured") {
    val r = Robots.parse(
      "User-agent: Foo\nCrawl-delay: 7\nDisallow: /x\n\nSitemap: http://s/map.xml\n")
    assert(r.crawlDelay("Foo/2.0").contains(7))
    assert(r.crawlDelay("Other").isEmpty)
    assert(r.sitemaps == Vector("http://s/map.xml"))
  }

  test("robots: allowedColumn equals canFetch for clean ASCII paths") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("robots-spec")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val paths = Seq("/search", "/search/docs", "/searchXtra", "/private/",
      "/anything", "/", "/tmpx", "/private/public/a")
    val got = paths.toDF("path")
      .select(org.apache.spark.sql.functions.col("path"),
        rules.allowedColumn("OpenFeeder-Sidecar",
          org.apache.spark.sql.functions.col("path")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    paths.foreach { p =>
      assert(got(p) == rules.canFetch("OpenFeeder-Sidecar", p), p)
    }
  }

  test("sitemap: pinned ElementTree matrix") {
    // default namespace; text kept raw then stripped like crawler.py:75,79
    val d = Sitemap.parse("""<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><lastmod>2024</lastmod><loc> http://a/1 </loc></url><url><loc>http://a/2</loc></url></urlset>""")
    assert(d == Vector(Sitemap.Entry("url", "http://a/1"), Sitemap.Entry("url", "http://a/2")))
    // prefixed namespace
    assert(Sitemap.parse("""<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9"><sm:url><sm:loc>http://p/1</sm:loc></sm:url></sm:urlset>""")
      == Vector(Sitemap.Entry("url", "http://p/1")))
    // NO namespace -> findall with ns prefix matches nothing
    assert(Sitemap.parse("""<urlset><url><loc>http://nons/1</loc></url></urlset>""").isEmpty)
    // sitemap index entries
    assert(Sitemap.parse("""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><sitemap><loc>http://a/s1.xml</loc></sitemap></sitemapindex>""")
      == Vector(Sitemap.Entry("sitemap", "http://a/s1.xml")))
    // CDATA literal (no entity expansion inside), entities expanded outside
    assert(Sitemap.parse("""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc><![CDATA[http://c/1?a=1&amp;b=2]]></loc></url></urlset>""")
      == Vector(Sitemap.Entry("url", "http://c/1?a=1&amp;b=2")))
    assert(Sitemap.parse("""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>http://a/1?x=1&amp;y=2</loc></url></urlset>""")
      == Vector(Sitemap.Entry("url", "http://a/1?x=1&y=2")))
    // only DIRECT children of the root
    assert(Sitemap.parse("""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>http://a/1</loc></url><other><url><loc>http://deep/x</loc></url></other></urlset>""")
      == Vector(Sitemap.Entry("url", "http://a/1")))
    // malformed -> empty (crawler catch-all)
    assert(Sitemap.parse("""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"><url><loc>x</url></urlset>""").isEmpty)
    assert(Sitemap.parse("not xml at all").isEmpty)
  }

  test("sitemap: .text/None/well-formedness edges match ElementTree exactly") {
    val ns = """xmlns="http://www.sitemaps.org/schemas/sitemap/0.9""""
    // .text = text BEFORE the first child; the tail after <lastmod/> is
    // the child's tail in ET, not loc.text
    assert(Sitemap.parse(s"""<urlset $ns><url><loc>http://a<lastmod/>tail</loc></url></urlset>""")
      == Vector(Sitemap.Entry("url", "http://a")))
    // truly empty loc: text is None -> `if loc.text:` skips it
    assert(Sitemap.parse(s"""<urlset $ns><url><loc></loc></url><url><loc/></url></urlset>""").isEmpty)
    // whitespace-only loc: text " " is truthy -> strips to ""
    assert(Sitemap.parse(s"""<urlset $ns><url><loc> </loc></url></urlset>""")
      == Vector(Sitemap.Entry("url", "")))
    // expat-grade well-formedness: unescaped '<', junk after root,
    // undefined entity all raise in ET -> empty here
    assert(Sitemap.parse(s"""<urlset $ns><url><loc>a < b</loc></url></urlset>""").isEmpty)
    assert(Sitemap.parse(s"""<urlset $ns></urlset><junk/>""").isEmpty)
    assert(Sitemap.parse(s"""<urlset $ns><url><loc>&foo;</loc></url></urlset>""").isEmpty)
  }
}
