package graft.wiki

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{TestSpark, Wikid}

/** Second-language proof: the full pipeline over nl-shaped fixtures with
  * lang="nl", driven through the facade — nothing in the engine is
  * en-hardcoded. The reference is parameterized by `lang` throughout
  * (wikidata.py:72 `{lang}wiki` sitelinks; Dutch namespaces `Bestand`/
  * `Categorie`/`Gebruiker` already sit in its global namespace list), so
  * the engine must behave identically when the language flips:
  *
  *  - F4: the `nlwiki` sitelink is the row filter (an entity with ONLY an
  *    `enwiki` sitelink is dropped entirely);
  *  - F3: labels/descriptions/aliases project the `nl` variants and
  *    IGNORE coexisting `en` ones;
  *  - T3: Dutch namespace spans (`[[Bestand:...]]`, `[[Categorie:...]]`)
  *    are stripped by the cleanup exactly like their English twins;
  *  - F8: Dutch meta titles (`Gebruiker:...`) are gated out;
  *  - the alias/link/annotation machinery runs unchanged.
  *
  * Expected values are closed-form by construction (no reference golden
  * needed — the en golden parity is WikidPipelineSpec's job).
  */
class WikidNlPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeLines(dir: String, name: String, lines: Seq[String]): String = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val f = d.resolve(name)
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toString
  }

  // ---- nl-shaped Wikidata dump -------------------------------------
  // Q10 carries BOTH nl and en labels/descriptions/aliases + both
  // sitelinks: the nl run must pick the nl side everywhere.
  private val wikidataLines = Seq(
    """{"type":"item","id":"Q10","claims":{"P31":[{"mainsnak":{"datavalue":{"value":{"id":"Q515"}}},"rank":"normal"}]},""" +
      """"sitelinks":{"nlwiki":{"title":"Amsterdam"},"enwiki":{"title":"Amsterdam (city)"}},""" +
      """"labels":{"nl":{"language":"nl","value":"Amsterdam"},"en":{"language":"en","value":"Amsterdam EN"}},""" +
      """"descriptions":{"nl":{"language":"nl","value":"hoofdstad van Nederland"},"en":{"language":"en","value":"capital of the Netherlands"}},""" +
      """"aliases":{"nl":[{"language":"nl","value":"Mokum"},{"language":"nl","value":"020"}],"en":[{"language":"en","value":"A'dam"}]}}""",
    """{"type":"item","id":"Q20","claims":{"P31":[{"mainsnak":{"datavalue":{"value":{"id":"Q6256"}}},"rank":"normal"}]},""" +
      """"sitelinks":{"nlwiki":{"title":"Nederland"}},""" +
      """"labels":{"nl":{"language":"nl","value":"Nederland"}},""" +
      """"descriptions":{"nl":{"language":"nl","value":"land in Europa"}},""" +
      """"aliases":{"nl":[{"language":"nl","value":"Holland"}]}}""",
    // enwiki-only sitelink: DROPPED under lang=nl (F4 is the row filter)
    """{"type":"item","id":"Q30","sitelinks":{"enwiki":{"title":"London"}},""" +
      """"labels":{"nl":{"language":"nl","value":"Londen"}}}""",
    // excluded-claim entity (disambiguation page): DROPPED (F2)
    """{"type":"item","id":"Q40","claims":{"P31":[{"mainsnak":{"datavalue":{"value":{"id":"Q4167410"}}},"rank":"normal"}]},""" +
      """"sitelinks":{"nlwiki":{"title":"Amsterdam (doorverwijspagina)"}},""" +
      """"labels":{"nl":{"language":"nl","value":"Amsterdam (doorverwijspagina)"}}}""",
    // non-item: DROPPED (F1)
    """{"type":"property","id":"P99","labels":{"nl":{"language":"nl","value":"eigenschap"}}}""")

  // ---- nl-shaped Wikipedia dump ------------------------------------
  private def page(title: String, id: Long, text: String): String =
    s"<page><title>$title</title><ns>0</ns><id>$id</id>" +
      s"<revision><id>${id * 10}</id><text>$text</text></revision></page>"

  private val wikipediaXml = Seq(
    "<mediawiki>",
    page("Amsterdam", 101,
      "Amsterdam is de hoofdstad van [[Nederland]], ook wel [[Nederland|Holland]] genoemd. " +
        "[[Bestand:Grachten.jpg]] [[Categorie:Hoofdsteden]] Het einde van de tekst hier."),
    page("Nederland", 102,
      "Nederland is een land in Europa met als hoofdstad [[Amsterdam]]. Nog wat tekst erbij."),
    page("Gebruiker:Jan", 104,
      "Dutch user-namespace meta page, must be gated out by F8."),
    page("Doorverwijzing", 105, "#REDIRECT [[Amsterdam]]"),
    "</mediawiki>")

  lazy val db: Wikid.Db = {
    val tmp = graft.Caches.newTempDir("graft_nl_fixtures").toString
    val wd = writeLines(tmp, "wikidata.json", wikidataLines)
    val wp = writeLines(tmp, "wikipedia.xml", wikipediaXml)
    Wikid.parse(spark, wd, wp, s"$tmp/warehouse", lang = "nl")
  }

  test("F4/F2/F1 under nl: only nlwiki-sitelinked, non-excluded items survive") {
    val ents = db.entities.collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(ents.keySet == Set("Q10", "Q20"), s"got ${ents.keySet}")
    // F3: the nl variants, never the coexisting en ones
    assert(ents("Q10").getAs[String]("name") == "Amsterdam")
    assert(ents("Q10").getAs[String]("description") == "hoofdstad van Nederland")
    assert(ents("Q10").getAs[String]("label") == "Amsterdam")
    assert(ents("Q20").getAs[String]("description") == "land in Europa")
  }

  test("property edges extracted under nl") {
    val props = db.properties.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(props == Set(("P31", "Q10", "Q515"), ("P31", "Q20", "Q6256")))
  }

  test("nl seed aliases + Dutch link anchors aggregate into the alias table") {
    val al = db.aliases.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // seeds: nl aliases only (the en alias A'dam must NOT appear)
    assert(al.get(("Mokum", "Q10")).contains(1L))
    assert(al.get(("020", "Q10")).contains(1L))
    assert(!al.keys.exists(_._1 == "A'dam"), s"en alias leaked: ${al.keys}")
    // link anchors: [[Amsterdam]] from page 102 AND from the redirect
    // page 105 — the prior-prob pass counts anchors on EVERY page (the
    // reference's read_prior_probs scans raw lines; F9/F10 gate only the
    // article-text pass); [[Nederland]] and [[Nederland|Holland]] from
    // page 101; Holland also a count=1 seed
    assert(al.get(("Amsterdam", "Q10")).contains(2L))
    assert(al.get(("Nederland", "Q20")).contains(1L))
    assert(al.get(("Holland", "Q20")).contains(2L), s"seed+anchor: $al")
  }

  test("T3/F8/F9 under nl: Dutch namespaces stripped, meta and redirect pages gated") {
    val arts = db.articles.collect()
      .map(r => r.getAs[String]("title") -> r.getAs[String]("content")).toMap
    assert(arts.keySet == Set("Amsterdam", "Nederland"), s"got ${arts.keySet}")
    val a = arts("Amsterdam")
    assert(!a.contains("Bestand:") && !a.contains("Categorie:"),
      s"Dutch namespace spans must be cleaned: $a")
    assert(a.contains("Holland genoemd"), s"link replaced by its mention: $a")
    assert(!a.contains("[["), s"no raw link markup survives: $a")
  }

  test("J5 under nl: mention offsets resolve through the nl title map") {
    val ann = db.annotations
      .filter(col("mention") === "Holland").collect()
    assert(ann.length == 1)
    val r = ann.head
    assert(r.getAs[String]("entity_id") == "Q10")        // page Amsterdam
    assert(r.getAs[String]("target_entity_id") == "Q20") // -> Nederland
    val arts = db.articles.filter(col("title") === "Amsterdam")
      .select("content").head().getString(0)
    val start = r.getAs[Int]("start_pos")
    val end = r.getAs[Int]("end_pos")
    assert(arts.substring(start, end) == "Holland",
      s"offsets must index the CLEANED text: '${arts.substring(start, end)}'")
  }

  test("alias priors via the facade under nl") {
    val priors = Wikid.aliasPriors(db).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
    assert(priors.keySet.contains("Holland"))
    for ((a, ps) <- priors)
      assert(math.abs(ps.sum - 1.0) < 1e-9, s"alias $a priors $ps")
  }
}
