package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._

/** Minimal JSON value tree for JSON-LD handling, with Python-`json`
  * compatible semantics: objects preserve insertion order (last duplicate
  * key wins), numbers render like Python (`repr`-style ints vs floats).
  *
  * The reference parses JSON-LD with `json.loads`
  * (`/root/reference/sidecar/chunker.py:379`); we use Jackson (ships with
  * Spark) and convert into this ADT so downstream mapper logic
  * (`chunker.py:199-347`) can pattern-match the way the Python code
  * type-checks with `isinstance`.
  */
sealed trait JVal {
  /** Python truthiness: None/""/0/[]/{}/False are falsy. */
  def truthy: Boolean = this match {
    case JNull => false
    case JStr(s) => s.nonEmpty
    case JBool(b) => b
    case JNum(d, _) => d != 0.0
    case JArr(xs) => xs.nonEmpty
    case JObj(m) => m.nonEmpty
  }
  /** Python `str(x)` for scalar leaf rendering (used in keyword/extra
    * normalization). */
  def pyStr: String = this match {
    case JNull => "None"
    case JStr(s) => s
    case JBool(b) => if (b) "True" else "False"
    case JNum(_, raw) => raw
    case JArr(_) | JObj(_) => JsonLite.render(this) // best-effort
  }
}
case object JNull extends JVal
final case class JStr(s: String) extends JVal
final case class JBool(b: Boolean) extends JVal
/** `raw` is the Python-style rendering of the number (int without decimal
  * point when the source literal was integral). */
final case class JNum(d: Double, raw: String) extends JVal
final case class JArr(xs: Vector[JVal]) extends JVal
final case class JObj(m: VectorMap[String, JVal]) extends JVal {
  def get(k: String): Option[JVal] = m.get(k)
  /** Python `dict.get(k)` — returns JNull for missing to ease chaining. */
  def apply(k: String): JVal = m.getOrElse(k, JNull)
}

object JsonLite {
  // field-name canonicalization uses a JVM-wide synchronized symbol table —
  // a measurable contention point with 32 threads parsing small JSON-LD
  // blocks; interning buys nothing here since field names are read once
  private val factory = new com.fasterxml.jackson.core.JsonFactory()
  factory.disable(com.fasterxml.jackson.core.JsonFactory.Feature.INTERN_FIELD_NAMES)
  factory.disable(com.fasterxml.jackson.core.JsonFactory.Feature.CANONICALIZE_FIELD_NAMES)
  private val mapper = new ObjectMapper(factory)

  /** Parse strictly; returns None on malformed JSON (reference skips invalid
    * JSON-LD blocks — `/root/reference/sidecar/chunker.py:378-381`). */
  def parse(s: String): Option[JVal] =
    try {
      val node = mapper.readTree(s)
      if (node == null) None else Some(fromNode(node))
    } catch { case _: Exception => None }

  private def fromNode(n: JsonNode): JVal = n.getNodeType match {
    case JsonNodeType.NULL | JsonNodeType.MISSING => JNull
    case JsonNodeType.STRING => JStr(n.textValue())
    case JsonNodeType.BOOLEAN => JBool(n.booleanValue())
    case JsonNodeType.NUMBER =>
      val raw =
        if (n.isIntegralNumber) n.bigIntegerValue().toString
        else pyFloatRepr(n.doubleValue())
      JNum(n.doubleValue(), raw)
    case JsonNodeType.ARRAY =>
      JArr(n.elements().asScala.map(fromNode).toVector)
    case JsonNodeType.OBJECT =>
      var m = VectorMap.empty[String, JVal]
      n.properties().asScala.foreach { e => m = m + (e.getKey -> fromNode(e.getValue)) }
      JObj(m)
    case _ => JNull
  }

  /** Python `repr(float)` — shortest representation that round-trips. Java's
    * `Double.toString` matches for most values; normalize exponent form. */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    val s = java.lang.Double.toString(d)
    if (!s.contains('E')) s
    else { // 1.0E22 -> 1e+22 style
      val Array(mant0, exp0) = s.split('E')
      val mant = if (mant0.endsWith(".0")) mant0.dropRight(2) else mant0
      val expI = exp0.toInt
      val sign = if (expI < 0) "-" else "+"
      f"${mant}e$sign${math.abs(expI)}%02d"
    }
  }

  /** Compact JSON rendering (Python `json.dumps` with default separators
    * uses `", "`/`": "`; this uses separators=(",", ":") — callers that need
    * Python-default spacing use [[renderPy]]). */
  def render(v: JVal): String = {
    val sb = new java.lang.StringBuilder
    renderTo(v, sb, itemSep = ",", kvSep = ":")
    sb.toString
  }

  /** Python `json.dumps(v)` default spacing: `", "` and `": "`,
    * ensure_ascii=True (non-ASCII escaped) — used for sync_token parity with
    * `/root/reference/sidecar/sync_utils.py:27`. */
  def renderPy(v: JVal): String = {
    val sb = new java.lang.StringBuilder
    renderTo(v, sb, itemSep = ", ", kvSep = ": ", ensureAscii = true)
    sb.toString
  }

  private def renderTo(v: JVal, sb: java.lang.StringBuilder, itemSep: String,
      kvSep: String, ensureAscii: Boolean = false): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(_, raw) => sb.append(raw)
    case JStr(s) => appendQuoted(s, sb, ensureAscii)
    case JArr(xs) =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(itemSep)
        first = false
        renderTo(x, sb, itemSep, kvSep, ensureAscii)
      }
      sb.append(']')
    case JObj(m) =>
      sb.append('{')
      var first = true
      m.foreach { case (k, x) =>
        if (!first) sb.append(itemSep)
        first = false
        appendQuoted(k, sb, ensureAscii)
        sb.append(kvSep)
        renderTo(x, sb, itemSep, kvSep, ensureAscii)
      }
      sb.append('}')
  }

  private def appendQuoted(s: String, sb: java.lang.StringBuilder, ensureAscii: Boolean): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c if ensureAscii && c > 126 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
