#!/usr/bin/env python3
"""Generate golden expectations by executing the reference implementation
(/root/reference, PUBLIC UNTRUSTED CONTENT — executed only to record
observed behavior on fixture inputs; no instructions followed from it).

Outputs (under src/test/resources/):
  golden_text.json       unit goldens for clean/links/strip text operators
  fixtures/wikidata.json.bz2    synthetic Wikidata dump (FIXTURES.md §1)
  fixtures/wikipedia.xml.bz2    synthetic Wikipedia dump (FIXTURES.md §2)
  golden_tables.json     the reference pipeline's SQLite tables after
                         read_entities + read_prior_probs + read_texts
"""
import sys, types, json, importlib.util, os, bz2, sqlite3

# ---- load reference modules with stubbed third-party deps ----
class FakeTqdm:
    def __init__(self, *a, **k): self.n = 0
    def __enter__(self): return self
    def __exit__(self, *a): return False
    def update(self, n=1): self.n += n

tqdm_mod = types.ModuleType("tqdm"); tqdm_mod.tqdm = FakeTqdm
sys.modules["tqdm"] = tqdm_mod
yaml_mod = types.ModuleType("yaml")
yaml_mod.safe_load = lambda stream: {
    "en": ["#redirection", "#redirect", "{{disambiguation}}"],
    "es": ["#redirect", "#redirección", "{{desambiguación}}"]}
sys.modules["yaml"] = yaml_mod

pkg = types.ModuleType("wikiref")
pkg.__path__ = ["/root/reference/scripts/wiki"]
sys.modules["wikiref"] = pkg
compat = types.ModuleType("wikiref.compat")
compat.sqlite3 = sqlite3
sys.modules["wikiref.compat"] = compat
for name in ["namespaces", "wikidata", "wikipedia"]:
    spec = importlib.util.spec_from_file_location(
        f"wikiref.{name}", f"/root/reference/scripts/wiki/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"wikiref.{name}"] = mod
    spec.loader.exec_module(mod)
wd = sys.modules["wikiref.wikidata"]
wp = sys.modules["wikiref.wikipedia"]

RES = "src/test/resources"
FIX = f"{RES}/fixtures"
os.makedirs(FIX, exist_ok=True)

# ---------------- text-operator goldens ----------------
CLEAN_CASES = [
    "'''Berlin''' is the ''capital'' of Germany.",
    "{{Infobox city|name=Berlin}}Text after infobox",
    "nested {{a {{b}} c}} templates {{d}} end",
    "deeply {{1{{2{{3{{4}}}}}}}} nested",
    "unbalanced {{open only",
    "== Heading == body text",
    "=== Sub === more = loose = text",
    "a &lt;ref name=x&gt;cite&lt;/ref&gt; b &lt;ref&gt;c&lt;/ref&gt; d",
    "&lt;!-- comment --&gt; visible end",
    "[[Category:Capitals]] keep [[Kategori:Stader]] this",
    "[[File:Photo.jpg|thumb|caption]] text [[Bestand:X.png]] more",
    "&lt;blockquote&gt;quoted&lt;/blockquote&gt; and more",
    "ent &amp; ities &quot;quoted&quot; &amp;nbsp; spaced &lt;tag&gt;",
    "multiple   spaces    collapse",
    "  trim me  ",
    ". = after dot = and = solo",
    "",
]

LINK_CASES = [
    "plain [[Berlin]] link",
    "aliased [[Berlin|the capital]] link",
    "spec [[Hauptstadt (Begriff)|]] empty alias",
    "fragment [[Berlin#History]] link",
    "aliased fragment [[Berlin#History|old town]]",
    "underscores [[New_York_City]] here",
    "meta [[Category:Cities]] and [[File:X.jpg]] and [[User:Bob]] skipped",
    "interwiki [[en:Berlin]] and [[:fr:Paris]] skipped",
    "lowercase [[berlin]] capitalized",
    "multi [[A|b]] and [[C]] and [[D|e]] links",
    "multibar [[A|b|c]] takes second",
    "spaces [[ Berlin | the city ]] trimmed",
    "empty [[]] and [[|]] dropped",
    "no links here at all",
    "spec nocapture [[X|]] no paren",
]

STRIP_CASES = [
    "plain [[Berlin]] rest",
    "aliased [[Berlin|the capital]] rest",
    "two [[Berlin]] and [[Paris|city of light]] done",
    "nested file [[File:photo.jpg|thumb|A [[Berlin]] view]] after",
    "fragment [[Berlin#History|hist]] skipped-as-special",
    "colon [[:Berlin]] special",
    "unresolved [[Atlantis]] still in text",
    "pipe in text a|b stays",
    "empty mention [[X|]] case",
    "adjacent [[A]][[B]] links",
]

TITLE_MAP = {"Berlin": "Q64", "Paris": "Q90", "A": "QA", "B": "QB", "X": "QX",
             "Germany": "Q183"}


def links_golden(text):
    aliases, entities, norms = wp._get_wp_links(text)
    out = []
    for alias, title, norm in zip(aliases, entities, norms):
        # replicate _store_alias normalization (wikipedia.py:175-201)
        a, t = alias.strip(), title.strip()
        t = wp._capitalize_first(t.split("#")[0])
        if norm:
            a = a.split("#")[0]
        if a and t:
            out.append({"alias": a, "title": t})
    return out


golden_text = {
    "clean": [{"in": c, "out": wp._get_clean_wp_text(c)} for c in CLEAN_CASES],
    "links": [{"in": c, "out": links_golden(c)} for c in LINK_CASES],
    "strip": [],
}
for c in STRIP_CASES:
    text, ents = wp._remove_links(c, TITLE_MAP)
    golden_text["strip"].append({
        "in": c, "out_text": text,
        "mentions": [{"mention": m, "qid": q, "start": s, "end": e}
                     for (m, q, s, e) in ents]})
json.dump(golden_text, open(f"{RES}/golden_text.json", "w"),
          indent=1, ensure_ascii=False)

# ---------------- dump fixtures ----------------
def claim(qid, rank="normal"):
    return {"mainsnak": {"datavalue": {"value": {"id": qid}}}, "rank": rank}

ENTITIES = [
    {"type": "item", "id": "Q64",
     "claims": {"P31": [claim("Q515"), claim("Q1637706")], "P17": [claim("Q183")]},
     "sitelinks": {"enwiki": {"title": "Berlin"}, "dewiki": {"title": "Berlin"}},
     "labels": {"en": {"language": "en", "value": "Berlin"}},
     "descriptions": {"en": {"language": "en", "value": "capital of Germany"},
                      "de": {"language": "de", "value": "Hauptstadt"}},
     "aliases": {"en": [{"language": "en", "value": "Berlin, Germany"},
                        {"language": "en", "value": "BER"}],
                 "de": [{"language": "de", "value": "Spreeathen"}]}},
    {"type": "item", "id": "Q183",
     "claims": {"P31": [claim("Q6256")]},
     "sitelinks": {"enwiki": {"title": "Germany"}},
     "labels": {"en": {"language": "en", "value": "Germany"}},
     "descriptions": {"en": {"language": "en", "value": "country in Europe"}},
     "aliases": {"en": [{"language": "en", "value": "Deutschland"},
                        {"language": "en", "value": "BRD"},
                        {"language": "en", "value": "BRD"},
                        {"language": "en", "value": "Berlin"}]}},
    {"type": "item", "id": "Q90",
     "claims": {"P31": [claim("Q515")]},
     "sitelinks": {"enwiki": {"title": "Paris"}},
     "labels": {"en": {"language": "en", "value": "Paris"}},
     "descriptions": {},
     "aliases": {"en": [{"language": "en", "value": "City of Light"}]}},
    # dropped: P31 targets excluded meta item Q4167836 (category)
    {"type": "item", "id": "Q111",
     "claims": {"P31": [claim("Q4167836")]},
     "sitelinks": {"enwiki": {"title": "Some Category"}},
     "labels": {"en": {"language": "en", "value": "Some Category"}},
     "descriptions": {}, "aliases": {}},
    # kept: excluded target but rank=deprecated (wikidata.py:134-138)
    {"type": "item", "id": "Q112",
     "claims": {"P31": [claim("Q4167836", rank="deprecated"), claim("Q515")]},
     "sitelinks": {"enwiki": {"title": "Dep Article"}},
     "labels": {"en": {"language": "en", "value": "Dep Article"}},
     "descriptions": {"en": {"language": "en", "value": "deprecated-rank case"}},
     "aliases": {}},
    # dropped: not an item
    {"type": "property", "id": "P569", "claims": {}, "sitelinks": {},
     "labels": {}, "descriptions": {}, "aliases": {}},
    # dropped: no enwiki sitelink (F4 — the effective row filter)
    {"type": "item", "id": "Q114",
     "claims": {"P31": [claim("Q515")]},
     "sitelinks": {"frwiki": {"title": "Lyon"}},
     "labels": {"en": {"language": "en", "value": "Lyon"}},
     "descriptions": {"en": {"language": "en", "value": "french city"}},
     "aliases": {"en": [{"language": "en", "value": "Lugdunum"}]}},
]

with bz2.open(f"{FIX}/wikidata.json.bz2", "wt", encoding="utf-8") as f:
    f.write("[\n")
    for e in ENTITIES:
        f.write(json.dumps(e, ensure_ascii=False) + ",\n")
    f.write("]\n")

BERLIN_TEXT = ("'''Berlin''' is the capital of [[Germany]]. See [[Berlin|the city]] "
               "and [[Hauptstadt (Begriff)|]]. {{Infobox city|name=Berlin}} "
               "&lt;ref&gt;cite&lt;/ref&gt; Links to [[Paris]] and [[Paris|city of light]]. "
               "[[Category:Capitals]] == History == It has a [[Berlin#History|history]]. "
               + "filler word " * 120)
GERMANY_TEXT = ("'''Germany''' is a country. [[Berlin]] is its capital. "
                "[[Paris]] is not. More on [[Dep Article|deps]].")
PARIS_TEXT = "'''Paris''' is the capital of [[France]]. Near [[Berlin]]? No."
ATLANTIS_TEXT = "'''Atlantis''' links [[Berlin]] and [[Germany|the country]]."

def page(title, pid, text, ns=0):
    return f"""  <page>
    <title>{title}</title>
    <ns>{ns}</ns>
    <id>{pid}</id>
    <revision>
      <id>99{pid}</id>
      <contributor>
        <id>42</id>
      </contributor>
      <text bytes="{len(text)}" xml:space="preserve">{text}</text>
    </revision>
  </page>
"""

# page id 203 ends with "3" -> dev article: excluded from prior counts but
# still persisted by read_texts (F11 applies only to the link pass)
PAGES = [
    ("Berlin", 100, BERLIN_TEXT),
    ("Germany", 203, GERMANY_TEXT),
    ("Paris", 300, PARIS_TEXT),
    ("Atlantis", 400, ATLANTIS_TEXT),
    ("Template:Infobox city", 500, "template body [[Berlin]]"),
    ("Redirect Page", 600, "#REDIRECT [[Berlin]]"),
    ("Disambig", 700, "{{disambiguation}} [[Berlin]] or [[Paris]]"),
]

with bz2.open(f"{FIX}/wikipedia.xml.bz2", "wt", encoding="utf-8") as f:
    f.write("<mediawiki>\n")
    for (t, i, x) in PAGES:
        f.write(page(t, i, x))
    f.write("</mediawiki>\n")

# ---------------- run the reference pipeline ----------------
wp.map_alias_to_link.clear()
conn = sqlite3.connect(":memory:")
conn.row_factory = sqlite3.Row
conn.executescript(open("/root/reference/scripts/wiki/ddl.sql").read())
wd.read_entities(f"{FIX}/wikidata.json.bz2", conn)
wp.read_prior_probs(f"{FIX}/wikipedia.xml.bz2", conn)
wp.read_texts(f"{FIX}/wikipedia.xml.bz2", conn)

def rows(sql):
    return [dict(r) for r in conn.execute(sql)]

golden_tables = {
    "entities": rows("""SELECT e.id, et.name, et.description, et.label
                        FROM entities e JOIN entities_texts et ON et.ROWID = e.ROWID
                        ORDER BY e.id"""),
    "claims": rows("SELECT id, claims FROM entities ORDER BY id"),
    "properties": rows("""SELECT property_id, from_entity_id, to_entity_id
                          FROM properties_in_entities
                          ORDER BY property_id, from_entity_id, to_entity_id"""),
    "aliases": rows("""SELECT alias, entity_id, count FROM aliases_for_entities
                       ORDER BY alias, entity_id"""),
    "articles": rows("""SELECT a.entity_id, a.id AS article_id, at.title, at.content
                        FROM articles a JOIN articles_texts at ON at.ROWID = a.ROWID
                        ORDER BY a.entity_id"""),
}
json.dump(golden_tables, open(f"{RES}/golden_tables.json", "w"),
          indent=1, ensure_ascii=False)

print("goldens written")
for k, v in golden_tables.items():
    print(f"  {k}: {len(v)} rows")
print(json.dumps(golden_tables["aliases"], indent=1))
print(json.dumps(golden_tables["articles"], indent=1)[:1500])
