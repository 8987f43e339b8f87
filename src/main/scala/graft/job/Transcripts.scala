package graft.job

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Fixtures
import graft.model.Turn

/** Deterministic synthetic transcript table (no external data, no
  * wall-clock — FIXTURES.md §1). Payloads mix the reference's four golden
  * fixtures with parameterized HTML/markdown templates so texts are unique
  * per turn while extraction semantics cover every operator path.
  *
  * Generation is fully distributed: `spark.range` over conversations,
  * `explode(sequence(...))` for turns, a typed map for payload synthesis —
  * no driver-side loops, so it scales to any turn count.
  */
object Transcripts {

  /** 2026-01-01T00:00:00Z */
  val EpochStart: Long = 1767225600L

  /** Geometric-ish turn-count pattern, median ~8 (FIXTURES.md §1). */
  private val sizes: Array[Int] = Array(2, 3, 4, 6, 8, 8, 8, 12, 16, 24, 40)

  private def mix(a: Long, b: Long): Long = {
    var h = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h
  }

  /** Payload pool: index → text. Entries 0-3 are the golden fixtures
    * verbatim; 4+ are parameterized templates (unique text per turn). */
  def payload(kind: Int, conv: Long, turn: Int): String = (kind % 10) match {
    case 0 => Fixtures.RECIPE_HTML_SINGLE_QUOTE
    case 1 => Fixtures.ARTICLE_HTML_DOUBLE_QUOTE
    case 2 => Fixtures.OPENGRAPH_ONLY_HTML
    case 3 => Fixtures.PLAIN_HTML
    case 4 => // markdown-ish plain text
      s"Turn $turn of conversation $conv continues the discussion in detail.\n\n" +
        s"The agent considered option $turn and compared it with option ${turn + 1}, " +
        "weighing throughput against latency across the candidate designs."
    case 5 => // noise-heavy page
      s"""<html lang="en"><head><title>Status update $conv/$turn</title></head><body>
         |<nav><a href="/">home</a></nav>
         |<div class="sidebar"><p>Sidebar junk that must be stripped away fully.</p></div>
         |<div class="cookie-banner"><p>We use cookies to improve your experience.</p></div>
         |<main><h1>Update number $turn for thread $conv</h1>
         |<p>The pipeline processed batch $turn of conversation $conv without error,
         |emitting partition metrics and lineage rows along the way.</p>
         |<ul><li>checkpoint $turn committed</li><li>bucket ${turn % 7} verified</li></ul>
         |</main><footer><p>Footer legal text that must also be dropped.</p></footer>
         |</body></html>""".stripMargin
    case 6 => // long text triggering the 1500-char sentence split
      val sentence = s"Step $turn of conversation $conv produced another batch of rows. "
      s"<html><body><article><p>${(sentence * 60).trim}</p></article></body></html>"
    case 7 => // typed blocks: code/list/quote/heading
      s"""<html><body><main>
         |<h2>Design notes for iteration $turn of $conv</h2>
         |<pre>def step_$turn(x):
         |    return x * $turn  # keep whitespace</pre>
         |<blockquote>Benchmark first, optimize second — iteration $turn.</blockquote>
         |<ol><li>read shard $turn input</li><li>extract and emit chunks</li></ol>
         |<p>Paragraph body for iteration $turn with enough length to emit.</p>
         |</main></body></html>""".stripMargin
    case 8 => // JSON-LD product page
      s"""<html lang="en"><head><title>Widget $turn</title>
         |<script type="application/ld+json">
         |{"@context":"https://schema.org","@type":"Product","name":"Widget $conv-$turn",
         | "description":"A synthetic product emitted by turn $turn.",
         | "brand":{"@type":"Brand","name":"GraftCo"},
         | "offers":{"@type":"Offer","price":"${10 + turn % 90}.99","priceCurrency":"USD",
         |           "availability":"InStock"},
         | "aggregateRating":{"ratingValue":"4.${turn % 10}","ratingCount":"${100 + turn}"}}
         |</script></head>
         |<body><main><h1>Widget $conv-$turn</h1>
         |<p>Product page body for widget $conv-$turn, with details long enough to chunk.</p>
         |</main></body></html>""".stripMargin
    case _ => // short / edge payload (below min chunk length)
      s"ok $turn"
  }

  private val roles = Array("user", "assistant", "tool", "system")
  private val tools = Array("", "browser", "render", "fetch")

  def mkTurn(conv: Long, turnIdx: Int, convPrefix: String): Turn = {
    val h = mix(conv, turnIdx.toLong)
    Turn(
      conv_id = s"$convPrefix$conv",
      turn_idx = turnIdx,
      role = roles(((h >>> 8) % 4).toInt.abs),
      text = payload(((h >>> 16) % 10).toInt.abs, conv, turnIdx),
      tool = tools(((h >>> 24) % 4).toInt.abs),
      ts = new Timestamp((EpochStart + conv * 3600L + turnIdx * 60L) * 1000L))
  }

  /** `nConvs` regular conversations + `megaTurns`-turn mega-conversations
    * (skew exercise, FIXTURES.md §1). Deterministic in (conv, turn) only. */
  def generate(spark: SparkSession, nConvs: Long, megaTurns: Int = 0,
      nMega: Int = 1): Dataset[Turn] = {
    import spark.implicits._
    val sizesCol = typedLit(sizes)
    val regular = spark.range(nConvs)
      .select($"id", explode(sequence(lit(0),
        element_at(sizesCol, (pmod($"id", lit(sizes.length)) + 1).cast("int")) - 1)).as("turn_idx"))
      .as[(Long, Int)]
      .map { case (c, t) => mkTurn(c, t, "conv-") }
    if (megaTurns <= 0) regular
    else {
      val mega = spark.range(nMega.toLong * megaTurns)
        .select(($"id" / megaTurns).cast("long").as("c"), pmod($"id", lit(megaTurns)).cast("int").as("t"))
        .as[(Long, Int)]
        .map { case (c, t) => mkTurn(c, t, "mega-") }
      regular.unionAll(mega)
    }
  }

  /** Expected total turns for `generate(nConvs, megaTurns, nMega)`. */
  def expectedCount(nConvs: Long, megaTurns: Int = 0, nMega: Int = 1): Long = {
    val full = nConvs / sizes.length * sizes.sum
    val rem = (0 until (nConvs % sizes.length).toInt).map(sizes(_)).sum
    full + rem + (if (megaTurns > 0) nMega.toLong * megaTurns else 0L)
  }
}
