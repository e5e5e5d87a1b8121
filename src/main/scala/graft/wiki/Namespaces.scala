package graft.wiki

/** Wiki namespace / meta-item constants.
  *
  * Data constants (not code) carried over for semantic parity with the
  * reference, which itself sources them from the public
  * explosion/projects nel-wikipedia wiki_namespaces.py
  * (ref /root/reference/scripts/wiki/namespaces.py:1-129).
  */
object Namespaces {

  /** Wikidata meta items excluded from the KB (ref namespaces.py:6-25). */
  val wdMetaItems: Seq[String] = Seq(
    "Q163875", "Q191780", "Q224414", "Q4167836", "Q4167410", "Q4663903",
    "Q11266439", "Q13406463", "Q15407973", "Q18616576", "Q19887878",
    "Q22808320", "Q23894233", "Q33120876", "Q42104522", "Q47460393",
    "Q64875536", "Q66480449")

  /** Punctuation + letters classes additionally excluded by the entity
    * filter (ref wikidata.py:75-84).
    */
  val wdExtraExcludes: Seq[String] = Seq(
    "Q1383557", "Q10617810",
    "Q188725", "Q19776628", "Q3841820", "Q17907810", "Q9788", "Q9398093")

  /** Default negative-claim filter: any non-deprecated P31/P279 claim
    * targeting one of these drops the entity (ref wikidata.py:77-88).
    */
  val defaultExcludeList: Seq[String] = wdMetaItems ++ wdExtraExcludes

  val wpFileNamespace: Seq[String] = Seq("Bestand", "File")
  val wpCategoryNamespace: Seq[String] = Seq("Kategori", "Category", "Categorie")

  /** Prefixes marking Wikipedia meta pages (ref namespaces.py:37-129). */
  val wpMetaNamespace: Seq[String] =
    wpFileNamespace ++ wpCategoryNamespace ++ Seq(
      "b", "betawikiversity", "Book", "c", "Commons", "d", "dbdump",
      "download", "Draft", "Education", "Foundation", "Gadget",
      "Gadget definition", "Gebruiker", "gerrit", "Help", "Image",
      "Incubator", "m", "mail", "mailarchive", "media", "MediaWiki",
      "MediaWiki talk", "Mediawikiwiki", "MediaZilla", "Meta",
      "Metawikipedia", "Module", "mw", "n", "nost", "oldwikisource",
      "otrs", "OTRSwiki", "Overleg gebruiker", "outreach", "outreachwiki",
      "Portal", "phab", "Phabricator", "Project", "q", "quality", "rev",
      "s", "spcom", "Special", "species", "Strategy", "sulutil", "svn",
      "Talk", "Template", "Template talk", "Testwiki", "ticket",
      "TimedText", "Toollabs", "tools", "tswiki", "User", "User talk",
      "v", "voy", "w", "Wikibooks", "Wikidata", "wikiHow", "Wikinvest",
      "wikilivres", "Wikimedia", "Wikinews", "Wikipedia", "Wikipedia talk",
      "Wikiquote", "Wikisource", "Wikispecies", "Wikitech", "Wikiversity",
      "Wikivoyage", "wikt", "wiktionary", "wmf", "wmania", "WP")

  private def quote(s: String): String = java.util.regex.Pattern.quote(s)

  /** Case-insensitive prefix-match pattern for meta titles/links: interwiki
    * (`:?xx:`) or any namespace prefix, optionally preceded by `:`
    * (ref wikipedia.py:43-47 builds the same alternation for re.match).
    * Anchored because the reference uses `re.match` (prefix semantics).
    */
  val nsPattern: String =
    "(?i)^(?::?[a-z][a-z]:" +
      wpMetaNamespace.map(ns => "|:?" + quote(ns) + ":").mkString + ")"

  /** `[[Category:...]]` spans (ref wikipedia.py:55-59: `[^\[]*` body). */
  val categoryPattern: String =
    wpCategoryNamespace.map(c => "\\[\\[" + quote(c) + ":[^\\[]*\\]\\]").mkString("|")

  /** `[[File:...]]` spans (ref wikipedia.py:49-53: `[^\[\]]+` body). */
  val filePattern: String =
    wpFileNamespace.map(f => "\\[\\[" + quote(f) + ":[^\\[\\]]+\\]\\]").mkString("|")

  /** Per-language page-skip substrings (lower-cased), from the reference's
    * configs/skip_terms.yaml:5-12.
    */
  val skipTerms: Map[String, Seq[String]] = Map(
    "en" -> Seq("#redirection", "#redirect", "{{disambiguation}}"),
    "es" -> Seq("#redirect", "#redirección", "{{desambiguación}}"))
}
