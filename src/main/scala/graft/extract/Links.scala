package graft.extract

import java.net.URI
import java.util.regex.Pattern

/** S3: link extraction + normalization —
  * `/root/reference/sidecar/crawler.py:43-98`:
  * all `a[href]`, resolve relative against the base, strip the fragment,
  * strip trailing slashes when the url has more than 3 `/`, same-origin
  * filter, skip 20 asset file extensions. Pure function; in the pipeline
  * it runs inside the extraction `mapPartitions` (the crawl frontier's
  * distributed analog is an iterative join over these edges).
  */
object Links {

  private val skipExtensions = Pattern.compile(
    "\\.(jpg|jpeg|png|gif|svg|webp|ico|pdf|zip|tar|gz|mp3|mp4|mov|avi|woff2?|ttf|eot|css|js)$",
    Pattern.CASE_INSENSITIVE)

  /** `_normalise_url`: defrag + conditional rstrip("/") — crawler.py:48-53. */
  def normaliseUrl(url: String): String = {
    val defragged = {
      val h = url.indexOf('#')
      if (h >= 0) url.substring(0, h) else url
    }
    if (defragged.endsWith("/") && defragged.count(_ == '/') > 3)
      defragged.reverse.dropWhile(_ == '/').reverse // Python rstrip("/") drops ALL
    else defragged
  }

  private def netloc(url: String): String =
    try Option(new URI(url).getAuthority).getOrElse("")
    catch { case _: Exception => "" }

  /** `urljoin(base, href)` resolution, best-effort RFC-3986. */
  def resolve(base: String, href: String): String =
    try new URI(base).resolve(href).toString
    catch { case _: Exception => href }

  /** `_extract_links` — crawler.py:85-98. Preserves document order and
    * duplicates (the caller's visited-set dedups, crawler.py:200-203). */
  def extractLinks(html: String, baseUrl: String): Vector[String] = {
    val doc = HtmlDom.parse(html)
    val base = netloc(baseUrl)
    doc.findAll("a").iterator
      .flatMap(_.attr("href"))
      .map(href => normaliseUrl(resolve(baseUrl, href)))
      .filter(u => netloc(u) == base && !skipExtensions.matcher(u).find())
      .toVector
  }
}
