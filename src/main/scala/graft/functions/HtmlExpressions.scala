package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A REAL HTML text-extraction state machine — the boilerplate-stripping
  * stage a web-crawl curation pipeline runs before any text analysis
  * (the trafilatura/jusText niche, reduced to its deterministic core).
  * One pass per document, native and codegen-friendly like the rest of
  * `graft.functions`.
  *
  * Semantics (each is a real-HTML behavior, spec-pinned in
  * `HtmlExtractSpec`):
  *   - tags are removed; attribute values may contain `>` inside single
  *     or double quotes (the naive regex failure mode);
  *   - `<script>`, `<style>`, `<title>` contents are RAW TEXT: dropped
  *     wholesale up to the matching case-insensitive close tag — a `<`
  *     or a quoted `"</p>"` inside script code must not resurface
  *     (per the HTML spec, raw text ends at the close tag regardless of
  *     JS quoting);
  *   - `<!-- comments -->` are dropped, including any tags inside them;
  *   - character references decode: the core named set (`amp lt gt quot
  *     apos nbsp`) plus decimal `&#34;` and hex `&#x22;` forms; an
  *     unterminated or unknown `&...` sequence passes through literally
  *     (browser behavior);
  *   - whitespace normalizes: any run of whitespace (including the
  *     separators block-level tags introduce) collapses to one space,
  *     ends trimmed.
  */
case class HtmlExtractText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract_text"

  override def nullSafeEval(input: Any): Any =
    HtmlExtractText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HtmlExtractText.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlExtractText = copy(child = newChild)
}

object HtmlExtractText {

  /** Tags whose content is raw text to be dropped wholesale. */
  private val RawTextTags = Set("script", "style", "title")

  /** Static so generated code can call it; one pass. */
  def compute(str: UTF8String): UTF8String = {
    val s = str.toString
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false // collapses whitespace runs + tag separators
    def emit(cp: Int): Unit = {
      if (Character.isWhitespace(cp)) { pendingSpace = true }
      else {
        if (pendingSpace && out.length() > 0) out.append(' ')
        pendingSpace = false
        out.appendCodePoint(cp)
      }
    }
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i + 1, "!--", 0, 3)) { // comment: to -->
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingSpace = true
        } else {
          // tag: name, then attributes honoring quoted values
          var j = i + 1
          val isClose = j < n && s.charAt(j) == '/'
          if (isClose) j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          var quote = 0.toChar
          var selfClosing = false
          var closed = false
          while (j < n && !closed) {
            val cj = s.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '>') closed = true
            else if (cj == '/') selfClosing = true
            else if (!Character.isWhitespace(cj) && cj != '=') selfClosing = false
            j += 1
          }
          i = j
          if (!closed) i = n // unterminated tag swallows the tail
          // every tag acts as a word separator (block tags in spirit;
          // for inline tags the collapse step makes it harmless only
          // when the markup sits at word boundaries — which is how
          // inline wrapping is used; mid-word <b> would add a space,
          // an accepted simplification documented in the scaladoc)
          if (closed && !isClose && !selfClosing && RawTextTags.contains(name)) {
            // raw text: skip to the matching close tag, case-insensitive
            val close = "</" + name
            var k = i
            var found = -1
            while (found < 0 && k < n) {
              val idx = indexOfIgnoreCase(s, close, k)
              if (idx < 0) found = n
              else {
                // the close tag must terminate with optional spaces + '>'
                var e = idx + close.length
                while (e < n && Character.isWhitespace(s.charAt(e))) e += 1
                if (e < n && s.charAt(e) == '>') found = e + 1
                else k = idx + 1
              }
            }
            i = if (found < 0) n else found
          }
          pendingSpace = true
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded =
          if (semi < 0 || semi - i > 10) -1
          else decodeEntity(s.substring(i + 1, semi))
        if (decoded >= 0) { emit(decoded); i = semi + 1 }
        else { emit(c.toInt); i += 1 } // pass '&' through literally
      } else {
        val cp = s.codePointAt(i)
        emit(cp)
        i += Character.charCount(cp)
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** Code point for a character-reference body (no `&`/`;`), or -1. */
  private def decodeEntity(body: String): Int = body match {
    case "amp" => '&'.toInt
    case "lt" => '<'.toInt
    case "gt" => '>'.toInt
    case "quot" => '"'.toInt
    case "apos" => '\''.toInt
    case "nbsp" => ' '.toInt
    case _ =>
      try {
        val cp =
          if (body.startsWith("#x") || body.startsWith("#X"))
            Integer.parseInt(body.substring(2), 16)
          else if (body.startsWith("#"))
            Integer.parseInt(body.substring(1), 10)
          else -1
        // &#x110000; parses but is not a Unicode code point
        // (appendCodePoint would throw), and a surrogate like &#xD800;
        // would append a lone surrogate that the UTF-8 encoder mangles
        // to '?' — both pass through literally instead
        if (Character.isValidCodePoint(cp) && !(cp >= 0xD800 && cp <= 0xDFFF)) cp
        else -1
      } catch { case _: NumberFormatException => -1 }
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val limit = s.length - needle.length
    while (i <= limit) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }
}

object HtmlFunctions {
  /** Column-API entry point for [[HtmlExtractText]]. */
  def html_extract_text(c: Column): Column =
    ColumnBridge.column(HtmlExtractText(ColumnBridge.expression(c)))
}
