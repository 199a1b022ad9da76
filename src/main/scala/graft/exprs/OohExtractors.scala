package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-extraction layer (SURVEY.md §2.2, P1–P11)
  * re-expressed as pure `Column => Column` functions — every extractor is a
  * Catalyst expression tree, so the whole wide projection runs inside one
  * whole-stage-codegen'd select with column pruning back into the XML scan.
  * No UDFs anywhere.
  *
  * Semantics are derived from /root/reference/index.js (cited per function).
  * Documented divergences from the reference (SURVEY §1.4):
  *   - numeric coercion yields null (not NaN) on non-numeric text;
  *   - an odd trailing industry cell maps to a null value (the reference
  *     would throw on `undefined.textContent`, index.js:102);
  *   - duplicate pay-map keys resolve last-wins (JS object-assignment
  *     semantics; requires spark.sql.mapKeyDedupPolicy=LAST_WIN, pinned in
  *     GraftSession).
  */
object OohExtractors {

  /** HTML-in-CDATA payloads re-parsed per row (reference `getDocument`,
    * index.js:3-5). Spark's `xpath` needs well-formed, single-rooted XML;
    * jsdom is lenient (SURVEY §1.4.1), so common HTML-not-XML patterns are
    * normalized here before parsing:
    *   - named HTML entities → numeric XML entities (`&nbsp;` et al);
    *   - any remaining bare `&` → `&amp;` (negative lookahead keeps real
    *     entities intact);
    *   - void elements (`<br>`, `<hr>`, `<img …>`) self-closed;
    * then wrap in a synthetic root so multi-element fragments parse.
    */
  /** Block tags whose start (or a container's close) implicitly ends an
    * open `<p>` in the HTML5 tree builder — the subset occurring in OOH
    * CDATA plus the table-row/cell tags (an open `<p>` inside a cell ends
    * with the cell). `li` open/close also ends an open `p` (the p lives
    * inside the li, which is about to end).
    */
  private val pBoundary =
    "</?(?:h[1-6]|ul|ol|div|table|section|tr|td|th)[\\s>]|<p[\\s>]|</?li[\\s>]"

  /** HTML5-style auto-close for the two unclosed tags real OOH exports
    * contain (jsdom parses these fine; Spark's strict `xpath` does not):
    *   - `<p>` closes at the next block/`<p>`/`<li>` boundary or end;
    *   - `<li>` closes at the next `<li>`, the list's `</ul>`/`</ol>`, or
    *     end.
    * The tempered dot `(?:(?!stop).)*` can only end at the FIRST stop
    * token: when that token is the tag's own close the fragment is
    * already well-formed and the regex leaves it byte-identical; when it
    * is a boundary, the close tag is inserted — exactly the tree
    * builder's rule.
    *
    * The `<li>` stop set also halts on OPENING `<ul>`/`<ol>` tags while the
    * lookahead does not accept them: an `<li>` that directly contains a
    * nested list therefore never matches and is left byte-identical —
    * well-formed nested lists must not have a stray `</li>` injected before
    * their inner list. Known non-goals (both left untouched, as before):
    * an explicitly closed `<p>` containing a block element (HTML5 itself
    * reparents those), and an UNclosed `<li>` whose body starts a nested
    * list.
    */
  /** Stop/accept token sets for the table-cell and table-row auto-close
    * rules (same tempered-dot mechanics as `<p>`/`<li>`): a cell ends at
    * the next cell/row/section boundary or the table's close; a row at
    * the next row/section boundary or the table's close. The stop sets
    * also halt on an OPENING `<table>` that the lookaheads do not accept:
    * an unclosed cell directly containing a nested table is left
    * byte-identical (the nested-list non-goal, table edition).
    */
  private val cellStop =
    "</td>|</th>|<td[\\s>]|<th[\\s>]|</?tr[\\s>]|</?table[\\s>]|</?(?:thead|tbody|tfoot)[\\s>]"
  private val cellEnd =
    "<td[\\s>]|<th[\\s>]|</?tr[\\s>]|</table[\\s>]|</?(?:thead|tbody|tfoot)[\\s>]"
  private val trStop =
    "</tr>|<tr[\\s>]|</?table[\\s>]|</?(?:thead|tbody|tfoot)[\\s>]"
  private val trEnd =
    "<tr[\\s>]|</table[\\s>]|</?(?:thead|tbody|tfoot)[\\s>]"

  private[graft] def autoClose(c: Column): Column = {
    val p = regexp_replace(
      c,
      s"(?s)<p(\\s[^>]*)?>((?:(?!</p>|$pBoundary).)*)(?=$pBoundary|$$)",
      "<p$1>$2</p>")
    val li = regexp_replace(
      p,
      "(?s)<li(\\s[^>]*)?>((?:(?!</li>|<li[\\s>]|</?(?:ul|ol)[\\s>]).)*)(?=<li[\\s>]|</(?:ul|ol)>|$)",
      "<li$1>$2</li>")
    // cells before rows: the injected `</td>` is in place before the
    // `<tr>` rule scans, so a mis-nested `<tr><td>a<tr>` heals outside-in
    val cells = regexp_replace(
      li,
      s"(?s)<(td|th)(\\s[^>]*)?>((?:(?!$cellStop).)*)(?=$cellEnd|$$)",
      "<$1$2>$3</$1>")
    regexp_replace(
      cells,
      s"(?s)<tr(\\s[^>]*)?>((?:(?!$trStop).)*)(?=$trEnd|$$)",
      "<tr$1>$2</tr>")
  }

  /** The HTML5 void-element set: start tags that never take content and
    * need self-closing for XML.
    */
  private val voidTags =
    "br|hr|wbr|img|input|col|embed|source|track|area|base|link|meta|param"

  def htmlAsXml(c: Column): Column = {
    // one compiled pass decodes ALL HTML4 named entities to numeric form
    // and escapes every other ampersand — see graft.exprs.HtmlEntities
    // (replaces the former per-entity regexp_replace chain)
    val entities = call_function("html_entities", c)
    val voids = regexp_replace(
      regexp_replace(entities, s"<($voidTags)\\s*>", "<$1/>"),
      s"<($voidTags)\\s+([^>/]*)>", "<$1 $2/>")
    concat(lit("<root>"), autoClose(voids), lit("</root>"))
  }

  /** P2 `xpathSelect` (index.js:7-17): evaluate an XPath over an HTML
    * fragment column, all matches in document order.
    */
  def htmlXpathAll(c: Column, xp: String): Column = xpath(htmlAsXml(c), lit(xp))

  /** P3 `cdataXpath` (index.js:23-38): concatenate every match's text, in
    * document order, with no separator.
    */
  def cdataConcat(c: Column, xp: String): Column = array_join(htmlXpathAll(c, xp), "")

  /** The reference logs a cardinality warning when a cdataXpath matches ≠ 1
    * nodes (index.js:33-35). Data-quality side-channel, not a failure.
    */
  def cardinalityWarning(c: Column, xp: String, label: String): Column =
    when(size(htmlXpathAll(c, xp)) =!= 1, lit(label))

  /** Whitespace normalization shared by the regex parsers:
    * `replace(/[\s\t\r\n]+/gm, ' ')` (index.js:110,117) ≡ `\s+` → " ".
    */
  def normWs(c: Column): Column = regexp_replace(c, "\\s+", " ")

  private def emptyToNull(c: Column): Column = when(c =!= "", c)

  /** P10 numeric coercion (index.js:151-152, JS unary `+`). Divergence
    * (SURVEY §1.4.2): non-numeric → null, not NaN; the guard also keeps the
    * cast ANSI-safe (Spark 4 ANSI casts throw on malformed input).
    */
  def toDoubleOrNull(c: Column): Column =
    when(c.rlike("^-?\\d+(\\.\\d+)?$"), c.cast("double"))

  // ---- P8: work schedules -------------------------------------------------

  /** Regex from index.js:143 (capture group 3), run over the raw HTML text
    * of `work_environment section_body`; `match && match[3]` → null when
    * the header is absent.
    */
  private val wsPattern =
    "<h3>( |<strong>)?Work [Ss]chedules?( |</strong>)?</h3> ?<p> ?(.+) ?</p>"

  def workSchedules(sectionBody: Column): Column =
    emptyToNull(regexp_extract(normWs(sectionBody), wsPattern, 3))

  // ---- P9: important qualities -------------------------------------------

  /** Regex from index.js:144 (capture group 4). */
  private val iqPattern =
    "<h3>( |<strong>)?Important [Qq]ualities?(&nbsp;)?( |</strong>)?</h3>(.*)"

  /** P9 `importantQualityParser` (index.js:115-133): normalize whitespace,
    * take everything after the Important Qualities header (group 4),
    * truncate at the next `<h3>`, XPath the `<p>` texts, split each at the
    * FIRST `". "` into key → sentence. When `". "` is absent the reference's
    * `indexOf`/`slice` arithmetic yields key = text minus its last char and
    * value = text minus its first char (JS slice(0,-1)/slice(1)) — kept
    * faithfully. Null (not a failure) when the header is absent.
    */
  def importantQualities(sectionBody: Column): Column = {
    val norm = normWs(sectionBody)
    val rest = regexp_extract(norm, iqPattern, 4)
    val frag = get(split(rest, "<h3>"), lit(0))
    val ps = htmlXpathAll(frag, "//p/text()")
    val entries = transform(ps, t => {
      val pos = instr(t, ". ")
      val key = when(pos > 0, t.substr(lit(1), pos - 1))
        .otherwise(t.substr(lit(1), length(t) - 1))
      val value = when(pos > 0, t.substr(pos + 2, length(t)))
        .otherwise(t.substr(lit(2), length(t)))
      struct(key.as("key"), value.as("value"))
    })
    when(norm.rlike(iqPattern), map_from_entries(entries))
  }

  // ---- P5: pay ------------------------------------------------------------

  /** Named-group regexes from index.js:59 and index.js:70. The annual wage
    * group `\d+,\d{3}` always captures exactly one comma, so the
    * reference's first-comma-only `replace` (index.js:65) and a global
    * replace are equivalent here.
    */
  private val annualRe = "The median annual wage for (.+) was \\$(\\d+,\\d{3})"
  private val hourlyRe = "The median hourly wage for (.+) was \\$(\\d+\\.\\d{2})"

  /** P5 `payParser` entries (index.js:57-85): per `<p>`, annual form first
    * (hourly = round(annual/2080, 2), index.js:65), else hourly form, else
    * no entry. Returns map suboccupation → hourly wage.
    */
  def pay(summaryPay: Column): Column = {
    val ps = htmlXpathAll(summaryPay, "//p/text()")
    val entries = filter(
      transform(ps, t => {
        val aKey = regexp_extract(t, annualRe, 1)
        val hKey = regexp_extract(t, hourlyRe, 1)
        val annual = round(
          regexp_replace(regexp_extract(t, annualRe, 2), ",", "").cast("double") / 2080, 2)
        val hourly = regexp_extract(t, hourlyRe, 2).cast("double")
        when(aKey =!= "", struct(aKey.as("key"), annual.as("value")))
          .when(hKey =!= "", struct(hKey.as("key"), hourly.as("value")))
      }),
      e => e.isNotNull)
    map_from_entries(entries)
  }

  /** P4/P5 `payText` (index.js:53): concatenation of every `//p` text. */
  def payText(summaryPay: Column): Column = cdataConcat(summaryPay, "//p/text()")

  // ---- P6: similar occupations -------------------------------------------

  /** P6 `similarOccupationsParser` (index.js:87-93): `//td//h4` texts,
    * trimmed, document order.
    */
  def similarOccupations(sectionBody: Column): Column =
    transform(htmlXpathAll(sectionBody, "//td//h4/text()"), t => trim(t))

  // ---- P7: top industries -------------------------------------------------

  /** P7 `topIndustryParser` (index.js:95-106): `//td` texts paired
    * positionally (even = industry, odd = percent, `%` stripped,
    * index.js:101-103). Divergence: an odd trailing cell yields a null
    * value (the reference would throw).
    */
  def topIndustries(sectionBody: Column): Column = {
    val a = htmlXpathAll(sectionBody, "//td/text()")
    map_from_entries(
      filter(
        transform(a, (x, i) =>
          when(i % 2 === 0,
            struct(x.as("key"), regexp_replace(get(a, i + 1), "%", "").as("value")))),
        e => e.isNotNull))
  }
}
