package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import AdapterChunker._

/** Goldens for the adapter-variant chunker, per
  * `/root/reference/adapters/express/src/chunker.js:19-136` and the FastAPI
  * mirror `/root/reference/adapters/fastapi/openfeeder_fastapi/chunker.py:16-113`. */
class AdapterChunkerSpec extends AnyFunSuite {

  // C1: entity decode table + whitespace rules (chunker.js:19-34)
  test("cleanHtml: tag strip + 6 entities + whitespace") {
    assert(cleanHtml("<p>a &amp; b</p>") == "a & b")
    assert(cleanHtml("&lt;tag&gt;") == "<tag>")
    assert(cleanHtml("&quot;q&quot; &#039;s&#039; x&nbsp;y") == "\"q\" 's' x y")
    // sequential decode: &amp;lt; -> &lt; -> <  (JS replace-order artifact)
    assert(cleanHtml("&amp;lt;") == "<")
    assert(cleanHtml("a \t\t b") == "a b")
    assert(cleanHtml("a\n\n\n\n\nb") == "a\n\nb")
    assert(cleanHtml("  <div> padded </div>  ") == "padded")
    assert(cleanHtml("") == "")
  }

  test("countWords") {
    assert(countWords("one two three") == 3)
    assert(countWords("  a  \n b ") == 2)
    assert(countWords("") == 0)
    assert(countWords("   ") == 0)
  }

  // C4: type detection table (chunker.js:48-73)
  test("detectType") {
    assert(detectType("```js\ncode here\n```") == "code")
    assert(detectType("> quoted wisdom") == "quote")
    assert(detectType("Short heading line") == "heading")
    assert(detectType(("w " * 20).trim) == "paragraph") // 1 line but 20 words
    assert(detectType("- item one\n- item two\n- item three") == "list")
    assert(detectType("1. first\n2) second\n* third\n+ fourth") == "list")
    assert(detectType("intro line that is long enough to not be a heading at all\n- only one of two lines is a list item") == "list")
    assert(detectType("line one with plenty of words to avoid heading here\nline two\nline three\n- item") == "paragraph")
    // 14-word single line is heading; 15 words is not
    assert(detectType(("w " * 14).trim) == "heading")
    assert(detectType(("w " * 15).trim) == "paragraph")
  }

  // C3: 500-word packing boundaries (chunker.js:93-112)
  test("chunkContent packing: 0/1/500/501 words") {
    assert(chunkContent("", "u") == Vector.empty)
    assert(chunkContent("<br/>", "u") == Vector.empty)

    val one = chunkContent("hello world", "u")
    assert(one.length == 1 && one.head.text == "hello world")

    val p500 = ("w " * 500).trim
    val single = chunkContent(p500, "u")
    assert(single.length == 1) // exactly 500 fits

    // two paragraphs of 400+200 words -> second flushes (400+200>500)
    val two = chunkContent(("a " * 400).trim + "\n\n" + ("b " * 200).trim, "u")
    assert(two.length == 2)
    assert(countWords(two(0).text) == 400 && countWords(two(1).text) == 200)

    // 300+200 = exactly 500 -> packed together, joined by blank line
    val packed = chunkContent(("a " * 300).trim + "\n\n" + ("b " * 200).trim, "u")
    assert(packed.length == 1)
    assert(packed.head.text == ("a " * 300).trim + "\n\n" + ("b " * 200).trim)

    // a single >500-word paragraph is NOT split (packer is paragraph-aligned)
    val big = chunkContent(("c " * 700).trim, "u")
    assert(big.length == 1 && countWords(big.head.text) == 700)
  }

  // C5: chunk ids = md5(url) + "_" + i (chunker.js:114-121)
  test("chunk ids are md5-prefixed and indexed") {
    val cs = chunkContent(("a " * 400).trim + "\n\n" + ("b " * 200).trim,
      "https://example.com/page")
    val prefix = md5Hex("https://example.com/page")
    assert(prefix == "fb37c0ebf91888a33317e3b814bc2d71")
    assert(cs.map(_.id) == Vector(s"${prefix}_0", s"${prefix}_1"))
    assert(cs.forall(_.relevance.isEmpty))
  }

  // C6: summarise (chunker.js:131-136)
  test("summarise: 40-word cap with ellipsis") {
    val short = "only a few words here"
    assert(summarise(short) == short)
    val long = ("word " * 50).trim
    assert(summarise(long) == ("word " * 40).trim + "...")
    assert(summarise("<p>" + long + "</p>", 10) == ("word " * 10).trim + "...")
  }

  test("sidecar ids: sha256 prefixes (indexer.py:383-392)") {
    // chunk id = sha256(f"{url}::chunk::{idx}")[:16], page id = sha256(f"page::{url}")[:16]
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def hex(s: String) = sha.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(hex("https://e.com/::chunk::0").take(16).length == 16)
    assert(hex("page::https://e.com/").take(16).length == 16)
  }
}
