package graft.wiki

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wikitext processing: link extraction (T1), normalization (T2), markup
  * cleanup (T3), offset-tracking link stripping (T4), and the article
  * predicates (F8-F14) — SURVEY.md §2.2-2.3.
  *
  * T1/T2 and all predicates are pure column expressions (whole-stage
  * codegen); T3/T4 are Scala UDFs by design (SURVEY.md §4.3: fixpoint loop
  * and position-tracking state machine are not regex-expressible).
  */
object WikiText {

  // ------------------------------------------------------------------
  // T2 — capitalize first char only; rest of string untouched
  // (ref wikipedia.py:246-256; NOT initcap semantics)
  // ------------------------------------------------------------------
  def capitalizeFirst(c: Column): Column =
    concat(upper(substring(c, 1, 1)), substring(c, 2, Int.MaxValue))

  // ------------------------------------------------------------------
  // T1 — interwiki link extraction (ref wikipedia.py:204-243)
  // Returns array<struct<alias, title, norm>> of raw (unnormalized) links.
  // ------------------------------------------------------------------
  def extractLinks(text: Column): Column = {
    val spans = regexp_extract_all(text, lit("\\[\\[[^\\[\\]]*\\]\\]"), lit(0))
    // match[2:-2], "_"->" ", strip (ref wikipedia.py:221)
    val inner = transform(spans, s =>
      trim(translate(regexp_replace(s, "^\\[\\[|\\]\\]$", ""), "_", " ")))
    val kept = filter(inner, m => !m.rlike(Namespaces.nsPattern))
    transform(kept, { m =>
      val parts = split(m, "\\|")
      val entity = trim(element_at(parts, 1))
      val alias = trim(element_at(parts, 2))
      when(size(parts) === 1,
        struct(m.as("alias"), m.as("title"), lit(true).as("norm")))
      .otherwise(when(length(coalesce(alias, lit(""))) === 0 && entity.contains("("),
        // [[alias (specification)|]] shape (ref wikipedia.py:232-237)
        struct(element_at(split(entity, "\\("), 1).as("alias"),
               entity.as("title"), lit(false).as("norm")))
      .otherwise(
        struct(alias.as("alias"), entity.as("title"), lit(false).as("norm"))))
    })
  }

  /** T2 — `_store_alias` normalization (ref wikipedia.py:175-201): strip
    * both sides; title: drop `#fragment`, capitalize first char; alias:
    * drop `#fragment` only when the link shape flagged normalization.
    * Empty alias or title drops the pair. Returns array<struct<alias,title>>.
    */
  def normalizeLinks(links: Column): Column =
    filter(
      transform(links, { l =>
        val alias0 = trim(l("alias"))
        val title0 = trim(l("title"))
        val title = capitalizeFirst(element_at(split(title0, "#"), 1))
        val alias =
          when(l("norm"), element_at(split(alias0, "#"), 1)).otherwise(alias0)
        struct(alias.as("alias"), title.as("title"))
      }),
      s => length(s("alias")) > 0 && length(s("title")) > 0)

  /** T1+T2 composed, column-expression form: text -> array<struct<alias,title>>.
    * Kept as the semantic reference for [[links]]; `LinksParitySpec` pins
    * bit-parity between the two on goldens, the documents corpus, and
    * adversarial random wikitext.
    */
  def linksExpr(text: Column): Column = normalizeLinks(extractLinks(text))

  // ------------------------------------------------------------------
  // T1+T2, JVM tight-loop form. The column composition above evaluates
  // interpreted per-element HOF lambdas (transform/filter are not
  // whole-stage-codegen'd) over regexp_extract_all — measured as the WP
  // ingest bottleneck. This single pass hand-rolls the exact same
  // semantics: the span regex \[\[[^\[\]]*\]\] can only match the full
  // greedy run (the body class excludes both brackets, so backtracking
  // can never resurrect a failed match), which makes an indexOf scanner
  // exact, and the only regex left is the anchored namespace prefix test.
  // ------------------------------------------------------------------
  final case class LinkPair(alias: String, title: String)

  private val nsRe = Pattern.compile(Namespaces.nsPattern)

  /** Spark `trim` semantics: strip ' ' (0x20) only — NOT Java trim's <=0x20. */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Spark `capitalizeFirst` semantics: first *codepoint* (substring counts
    * codepoints) upper-cased locale-independently, rest untouched.
    */
  private def capFirstJvm(s: String): String =
    if (s.isEmpty) s
    else {
      val n = Character.charCount(s.codePointAt(0))
      s.substring(0, n).toUpperCase(java.util.Locale.ROOT) + s.substring(n)
    }

  /** One extracted+normalized link (the T1 struct then the T2 rewrite),
    * appended to `out` unless a filter drops it. `raw` is the span body
    * between the brackets.
    */
  private def emitLink(raw: String,
                       out: scala.collection.mutable.ArrayBuffer[LinkPair]): Unit = {
    val inner = trimSpaces(raw.replace('_', ' '))
    if (nsRe.matcher(inner).find()) return // F-namespace drop (anchored pattern)
    val bar = inner.indexOf('|')
    var alias1: String = null; var title1: String = null; var norm = false
    if (bar < 0) { alias1 = inner; title1 = inner; norm = true }
    else {
      val entity = trimSpaces(inner.substring(0, bar))
      val bar2 = inner.indexOf('|', bar + 1)
      val alias = trimSpaces(
        inner.substring(bar + 1, if (bar2 < 0) inner.length else bar2))
      val par = entity.indexOf('(')
      if (alias.isEmpty && par >= 0) {
        alias1 = entity.substring(0, par) // [[alias (specification)|]] shape
        title1 = entity
      } else { alias1 = alias; title1 = entity }
    }
    // T2 normalization (trim, #fragment, capitalize; empty drops the pair)
    val alias0 = trimSpaces(alias1)
    val title0 = trimSpaces(title1)
    val hashT = title0.indexOf('#')
    val title = capFirstJvm(if (hashT >= 0) title0.substring(0, hashT) else title0)
    val alias2 =
      if (norm) {
        val h = alias0.indexOf('#')
        if (h >= 0) alias0.substring(0, h) else alias0
      } else alias0
    if (alias2.nonEmpty && title.nonEmpty) out += LinkPair(alias2, title)
  }

  def linksImpl(text: String): Array[LinkPair] = {
    if (text == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[LinkPair]
    val n = text.length
    var i = text.indexOf("[[")
    while (i >= 0) {
      var j = i + 2
      while (j < n && text.charAt(j) != '[' && text.charAt(j) != ']') j += 1
      if (j + 1 < n && text.charAt(j) == ']' && text.charAt(j + 1) == ']') {
        emitLink(text.substring(i + 2, j), out)
        i = text.indexOf("[[", j + 2)
      } else {
        // the regex engine resumes the search one char past the failed start
        i = text.indexOf("[[", i + 1)
      }
    }
    out.toArray
  }

  private val linksUdf = udf(linksImpl _)

  /** T1+T2 composed: text column -> array<struct<alias,title>>. */
  def links(text: Column): Column = linksUdf(text)

  // ------------------------------------------------------------------
  // Predicates F8-F12 (ref wikipedia.py:496-498,507-509,314-337,655-687)
  // ------------------------------------------------------------------
  def isMetaTitle(title: Column): Column = title.rlike(Namespaces.nsPattern)

  def isRedirect(text: Column): Column = text.startsWith("#REDIRECT")

  /** F10 — page-level skip: any skip term appears (lower-cased) anywhere in
    * the page (the reference checks every raw line; a page-level contains is
    * equivalent since the terms are line-local substrings).
    */
  def shouldSkip(text: Column, lang: String = "en"): Column = {
    val terms = Namespaces.skipTerms.getOrElse(lang, Seq("#redirect"))
    terms.map(t => lower(text).contains(t)).reduce(_ || _)
  }

  /** F11 — dev split: article ID string ends with "3" (ref wikipedia.py:655-662). */
  def isDev(articleId: Column): Column = articleId.cast("string").endsWith("3")

  def isValidArticle(text: Column): Column = length(text).between(11, 29999)

  def isValidSentence(text: Column): Column =
    length(text).between(11, 2999) &&
      !trim(text).startsWith("*") && !trim(text).startsWith("#")

  // ------------------------------------------------------------------
  // F14 — truncate + punctuation fixups + drop final (possibly cut) word
  // (ref wikipedia.py:360-381)
  // ------------------------------------------------------------------
  def truncateContent(text: Column, nCharLimit: Int = 1000): Column = {
    var t = substring(text, 1, nCharLimit)
    for ((from, to) <- Seq("(;" -> " ", "(," -> " ", " ; " -> " ", " , " -> "", "()" -> ""))
      t = replace(t, lit(from), lit(to))
    val words = split(t, " ")
    array_join(slice(words, lit(1), greatest(size(words) - 1, lit(0))), " ")
  }

  // ------------------------------------------------------------------
  // T3 — wikitext markup cleanup (ref wikipedia.py:515-574).
  // Scala UDF: the nested-template removal is a fixpoint loop. Handles both
  // the XML-escaped form the reference sees on raw dump lines and the
  // unescaped form produced by the Spark XML source.
  // ------------------------------------------------------------------
  private val infoRe = Pattern.compile("\\{[^{]*?\\}")
  private val htmlEscRe = Pattern.compile("&lt;!--[^-]*--&gt;")
  private val htmlRe = Pattern.compile("<!--[^-]*-->")
  private val refEscRe = Pattern.compile("&lt;ref.*?&gt;")
  private val refEsc2Re = Pattern.compile("&lt;/ref.*?&gt;")
  private val refRe = Pattern.compile("<ref.*?>")
  private val ref2Re = Pattern.compile("</ref.*?>")
  private val categoryRe = Pattern.compile(Namespaces.categoryPattern)
  private val fileRe = Pattern.compile(Namespaces.filePattern)

  def cleanWikitextImpl(raw: String): String = {
    if (raw == null) return null
    var t = raw.trim.replace("'''", "").replace("''", "")
    // fixpoint: innermost {...} removed until length stops shrinking
    var prev = -1
    while (t.length != prev) {
      prev = t.length
      t = infoRe.matcher(t).replaceAll("")
    }
    t = htmlEscRe.matcher(t).replaceAll("")
    t = htmlRe.matcher(t).replaceAll("")
    t = categoryRe.matcher(t).replaceAll("")
    t = fileRe.matcher(t).replaceAll("")
    while (t.contains("==")) t = t.replace("==", "=")
    t = t.replace(". =", ".").replace(" = ", ". ").replace("= ", ".").replace(" =", "")
    t = refEscRe.matcher(t).replaceAll("")
    t = refEsc2Re.matcher(t).replaceAll("")
    t = refRe.matcher(t).replaceAll("")
    t = ref2Re.matcher(t).replaceAll("")
    t = t.replace("&lt;blockquote&gt;", "").replace("&lt;/blockquote&gt;", "")
    t = t.replace("<blockquote>", "").replace("</blockquote>", "")
    t = t.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    t = t.replace("&amp;nbsp;", " ").replace("&nbsp;", " ").replace("&amp;", "&")
    while (t.contains("  ")) t = t.replace("  ", " ")
    t.trim
  }

  private val cleanUdf = udf(cleanWikitextImpl _)
  def cleanWikitext(text: Column): Column = cleanUdf(text)

  // ------------------------------------------------------------------
  // T4 — link stripping with mention offsets (ref wikipedia.py:577-652).
  // Char-by-char state machine; emits final text plus ALL mentions with
  // their raw (unresolved) titles — resolution to QIDs is a downstream
  // broadcast join (replaces the reference's driver-side dict lookup at
  // wikipedia.py:639-642, so no driver state is needed at scale).
  // ------------------------------------------------------------------
  case class Mention(mention: String, title: String, start: Int, end: Int)
  case class Stripped(text: String, mentions: Seq[Mention])

  def stripLinksImpl(cleanText: String): Stripped = {
    if (cleanText == null) return Stripped(null, Seq.empty)
    val finalText = new StringBuilder
    val mentions = scala.collection.mutable.ArrayBuffer.empty[Mention]
    var openRead = 0
    var readingText = true
    var readingEntity = false
    var readingMention = false
    var readingSpecial = false
    val entityBuf = new StringBuilder
    val mentionBuf = new StringBuilder
    for (letter <- cleanText) {
      letter match {
        case '[' => openRead += 1
        case ']' => openRead -= 1
        case '|' =>
          if (readingText) finalText += letter
          else if (readingEntity) { readingText = false; readingEntity = false; readingMention = true }
          else readingSpecial = true
        case _ =>
          if (readingEntity) entityBuf += letter
          else if (readingMention) mentionBuf += letter
          else if (readingText) finalText += letter
          else finalText += letter // unreachable-state guard (ref raises ValueError here)
      }
      if (openRead > 2) readingSpecial = true
      if (openRead == 2 && readingText) { readingText = false; readingEntity = true; readingMention = false }
      if (openRead == 0 && !readingText) {
        if (entityBuf.toString.contains("#") || entityBuf.toString.startsWith(":"))
          readingSpecial = true
        if (!readingSpecial) {
          if (mentionBuf.isEmpty) mentionBuf ++= entityBuf
          val start = finalText.length
          val end = start + mentionBuf.length
          mentions += Mention(mentionBuf.toString, entityBuf.toString, start, end)
          finalText ++= mentionBuf
        }
        entityBuf.clear(); mentionBuf.clear()
        readingText = true; readingEntity = false; readingMention = false; readingSpecial = false
      }
    }
    Stripped(finalText.toString, mentions.toSeq)
  }

  private val stripUdf = udf(stripLinksImpl _)

  /** text -> struct<text, mentions array<struct<mention,title,start,end>>>. */
  def stripLinks(cleanText: Column): Column = stripUdf(cleanText)

  /** T3 + T4 composed. */
  def processText(rawText: Column): Column = stripLinks(cleanWikitext(rawText))
}
