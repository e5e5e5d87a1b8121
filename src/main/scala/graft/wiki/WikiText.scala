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

  /** T1+T2 composed: text column -> array<struct<alias,title>>. */
  def links(text: Column): Column = normalizeLinks(extractLinks(text))

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
