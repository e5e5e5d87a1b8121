package graft.wiki

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end pipeline parity: synthetic dump fixtures -> EntitiesJob +
  * AliasesJob + ArticlesJob, compared against the reference pipeline's
  * actual SQLite tables (golden_tables.json, from tools/gen_golden.py).
  */
class WikidPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val fixDir = TestSpark.resource("/fixtures")
  lazy val golden = spark.read.option("multiLine", "true")
    .json(TestSpark.resource("/golden_tables.json"))

  lazy val raw = WikidataSource.read(spark, s"$fixDir/wikidata.json.bz2")
  lazy val ents = EntitiesJob.run(raw)
  lazy val pages = WikipediaSource.read(spark, s"$fixDir/wikipedia.xml.bz2")
  lazy val titleMap = Queries.titleMap(ents.entities)
  lazy val aliases = AliasesJob.run(ents.aliases, pages, titleMap)
  lazy val articles = ArticlesJob.run(pages, titleMap)

  private def goldenRows(section: String, cols: String*): Set[Seq[Any]] =
    golden.select(explode(col(section)).as("r"))
      .select(cols.map(c => col(s"r.$c")): _*)
      .collect().map(_.toSeq).toSet

  test("A7: observed parse metrics match independently computed counters") {
    // entities job: records seen / items kept / entities persisted
    val e = ents.entities
    val nEnts = e.collect().length.toLong
    val em = e.queryExecution.observedMetrics
    assert(em("graft.entities.records").getAs[Long]("n_records") == raw.count())
    assert(em("graft.entities.persisted").getAs[Long]("n_persisted") == nEnts)
    assert(em("graft.entities.items").getAs[Long]("n_items") >= nEnts)

    // articles job: pages seen / viable / persisted (ref wikipedia.py:427-432)
    val a = articles.articles
    val nArts = a.collect().length.toLong
    val am = a.queryExecution.observedMetrics
    val nViableExpected = pages
      .filter(col("article_id").isNotNull && col("text").isNotNull)
      .filter(!WikiText.shouldSkip(col("text"), "en"))
      .filter(!WikiText.isMetaTitle(col("title")))
      .filter(!WikiText.isRedirect(col("text")))
      .count()
    assert(am("graft.articles.pages").getAs[Long]("n_pages") == pages.count())
    assert(am("graft.articles.viable").getAs[Long]("n_viable") == nViableExpected)
    assert(am("graft.articles.persisted").getAs[Long]("n_persisted") == nArts)
    // the reference's summary ratio is derivable from the same counters
    assert(am("graft.articles.pages").getAs[Long]("n_pages") >= nViableExpected)
  }

  test("S1 tolerates malformed dump lines like the reference's try/except") {
    import spark.implicits._
    // ref wikidata.py wraps json.loads per line; the engine's from_json
    // yields null for unparseable lines and the isNotNull gate drops them
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString + "/dump"
    Seq(
      "[",
      """{"type":"item","id":"Q1","sitelinks":{"enwiki":{"title":"One"}},""" +
        """"labels":{"en":{"language":"en","value":"One"}}},""",
      "{not json at all",
      """{"truncated": """,
      """{"type":"item","id":"Q2","sitelinks":{"enwiki":{"title":"Two"}}},""",
      "]"
    ).toDF("value").coalesce(1).write.text(dir)
    val got = EntitiesJob.run(WikidataSource.read(spark, dir))
      .entities.select("id").collect().map(_.getString(0)).toSet
    assert(got == Set("Q1", "Q2"))
  }

  test("read_filter_terms loads newline-stripped distinct terms") {
    val f = java.nio.file.Files.createTempFile("graft_terms", ".txt")
    java.nio.file.Files.write(f,
      "New York\nBoston\n\nNew York\nKöln\n".getBytes("UTF-8"))
    val terms = WikidataSource.readFilterTerms(f.toString)
    assert(terms == Set("New York", "Boston", "Köln"))
  }

  test("S10: filterDumpByTitles round-trips exactly the retained pages") {
    import spark.implicits._
    val all = pages.select("title", "article_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(all.length > 2)
    // retain a strict subset, like the reference's label-set rewriter
    // (ref wikipedia.py:435-483: keep <page> iff title in filter set)
    val keep = all.map(_._1).distinct.sorted.take(2).toSet
    val out = java.nio.file.Files.createTempDirectory("graft_s10").toString + "/dump"
    WikipediaSource.filterDumpByTitles(spark, s"$fixDir/wikipedia.xml.bz2", out,
      keep.toSeq.toDF("title"))
    val got = WikipediaSource.read(spark, out)
      .select("title", "article_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // exactly the retained titles survive, with page id and revision text
    // byte-identical to the original dump's pages
    assert(got.map(_._1).toSet == keep)
    assert(got.toSet == all.filter(p => keep(p._1)).toSet)
  }

  test("entities table matches reference (id, name, description, label)") {
    val got = ents.entities.select("id", "name", "description", "label")
      .collect().map(_.toSeq).toSet
    assert(got == goldenRows("entities", "id", "name", "description", "label"))
  }

  test("entities claims keep only matched P31/P279 groups") {
    val claims = ents.entities.select("id", "claims").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // Q64 had P31 (2 claims) and P17; only the P31 group is serialized
    assert(claims("Q64").contains("Q515") && claims("Q64").contains("Q1637706"))
    assert(!claims("Q64").contains("Q183"))
    // Q112's deprecated-rank excluded claim is still serialized (kept entity)
    assert(claims("Q112").contains("Q4167836"))
  }

  test("properties edge table matches reference (incl. deprecated-rank edges)") {
    val got = ents.properties.collect().map(_.toSeq).toSet
    assert(got == goldenRows("properties", "property_id", "from_entity_id", "to_entity_id"))
  }

  test("A1 alias counts match reference upsert-accumulated table") {
    val got = aliases.collect().map(_.toSeq).toSet
    assert(got == goldenRows("aliases", "alias", "entity_id", "count"))
  }

  test("articles match reference incl. cleaned+truncated content bytes") {
    val got = articles.articles
      .select("entity_id", "article_id", "title", "content")
      .collect().map(_.toSeq).toSet
    assert(got == goldenRows("articles", "entity_id", "article_id", "title", "content"))
  }

  test("A3 priors normalize per alias and sum to 1") {
    val priors = Queries.aliasPriorsFlat(aliases)
    // shared alias "Berlin": Q64 from links+0 seed, Q183 from seed
    val berlin = priors.filter(col("alias") === "Berlin")
      .select("entity_id", "count", "prior")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val total = berlin.values.map(_._1).sum
    assert(berlin("Q64")._2 == berlin("Q64")._1.toDouble / total)
    assert(berlin("Q183")._2 == berlin("Q183")._1.toDouble / total)
    val sums = priors.groupBy("alias").agg(sum("prior").as("s"))
      .select("s").collect().map(_.getDouble(0))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("J1 loadEntities rolls up aliases + article + counts per entity") {
    val loaded = Queries.loadEntities(ents.entities, articles.articles, aliases)
    val byQid = loaded.collect().map(r => r.getAs[String]("qid") -> r).toMap
    assert(byQid.keySet == Set("Q64", "Q183", "Q90", "Q112"))
    val q64 = byQid("Q64")
    val q64Aliases = q64.getSeq[String](q64.fieldIndex("aliases")).toSet
    // declared + link aliases ∪ {name, article_title, label}
    assert(q64Aliases.contains("Berlin, Germany")) // comma preserved (A4 fix)
    assert(q64Aliases.contains("the city") && q64Aliases.contains("Berlin"))
    assert(q64.getAs[Long]("count") > 0)
    assert(q64.getAs[String]("article_title") == "Berlin")
    // Q112 has no article, no aliases: count 0, aliases = {name, label}
    val q112 = byQid("Q112")
    assert(q112.getAs[Long]("count") == 0L)
    assert(q112.getSeq[String](q112.fieldIndex("aliases")).toSet == Set("Dep Article"))
    assert(q112.getAs[String]("article_title") == null)
  }

  test("F15 point lookup filters to requested qids") {
    val two = Queries.loadEntities(ents.entities, articles.articles, aliases,
      qids = Seq("Q64", "Q90", "Q64"))
    assert(two.select("qid").collect().map(_.getString(0)).toSet == Set("Q64", "Q90"))
  }

  test("typed Dataset[Entity] surface") {
    val ds = Queries.loadEntitiesTyped(spark, ents.entities, articles.articles, aliases)
    val e = ds.collect().map(e => e.qid -> e).toMap
    assert(e("Q64").articleTitle.contains("Berlin"))
    assert(e("Q90").description.isEmpty)
  }

  test("annotations carry resolved mention offsets into article text") {
    val anns = articles.annotations.collect()
    assert(anns.nonEmpty)
    // every annotation's offsets must slice the mention text out of content's
    // untruncated source — verify against clean text reconstruction
    val cleanByArticle = pages
      .filter(!WikiText.shouldSkip(col("text")) && !WikiText.isMetaTitle(col("title")) &&
        !WikiText.isRedirect(col("text")))
      .select(col("article_id"), WikiText.processText(col("text"))("text").as("clean"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (a <- anns) {
      val clean = cleanByArticle(a.getAs[String]("article_id"))
      val m = a.getAs[String]("mention")
      val s = a.getAs[Int]("start_pos"); val e = a.getAs[Int]("end_pos")
      assert(clean.substring(s, e) == m)
    }
  }

  test("KB tables: entities vectors + aliases with pseudo-aliases") {
    val loaded = Queries.loadEntities(ents.entities, articles.articles, aliases)
    val kbe = Kb.kbEntities(loaded)
    val rows = kbe.collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val v = r.getSeq[Float](r.fieldIndex("vector"))
      assert(v.length == 64)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
    }
    val kba = Kb.kbAliases(aliases, loaded)
    val pseudo = kba.filter(col("alias") === "_Q64_").collect()
    assert(pseudo.length == 1)
    assert(pseudo.head.getSeq[String](1) == Seq("Q64"))
    assert(pseudo.head.getSeq[Double](2) == Seq(1.0))
    // real alias rows have paired arrays
    val berlin = kba.filter(col("alias") === "Berlin").head
    assert(berlin.getSeq[String](1).toSet == Set("Q64", "Q183"))
  }

  test("S7: description CSV sink round-trips (qid, fallback description)") {
    val loaded = Queries.loadEntities(ents.entities, articles.articles, aliases)
    val out = java.nio.file.Files.createTempDirectory("graft_s7").toString + "/desc"
    Kb.writeDescriptions(loaded, out)
    val got = spark.read.csv(out).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = loaded.select(col("qid"),
        Kb.descriptionFallback(col("description"), col("article_text"), col("name"))
          .as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty && got.keySet.forall(_.startsWith("Q")))
  }

  test("BatchEmbedder: per-partition batched model produces unit vectors") {
    val loaded = Queries.loadEntities(ents.entities, articles.articles, aliases)
    val model = new Kb.BatchEmbedder.Hashing(32)
    val out = new Kb.BatchEmbedder(model, batchSize = 2)
      .embed(loaded.withColumn("desc",
        Kb.descriptionFallback(col("description"), col("article_text"), col("name"))),
        "desc", "qid")
    val rows = out.collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val v = r.getSeq[Float](1)
      assert(v.length == 32)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4 || n == 0.0)
    }
    // deterministic across runs
    val again = new Kb.BatchEmbedder(model, batchSize = 3)
      .embed(loaded.withColumn("desc",
        Kb.descriptionFallback(col("description"), col("article_text"), col("name"))),
        "desc", "qid").collect()
    assert(rows.map(r => r.getString(0) -> r.getSeq[Float](1)).toMap ==
      again.map(r => r.getString(0) -> r.getSeq[Float](1)).toMap)
  }

  test("F6 resume anti-join skips already-ingested entity ids") {
    import spark.implicits._
    val existing = Seq("Q64").toDF("id")
    val resumed = EntitiesJob.run(raw, existingIds = Some(existing))
    val ids = resumed.entities.select("id").collect().map(_.getString(0)).toSet
    assert(!ids.contains("Q64") && ids.contains("Q183"))
  }

  test("S9 filtered-dump rewriter keeps only matching lines") {
    val out = java.nio.file.Files.createTempDirectory("graftdump").toString + "/filtered"
    WikidataSource.filterDump(spark, s"$fixDir/wikidata.json.bz2", out,
      Seq("berlin"))
    val re = WikidataSource.read(spark, out)
    val ids = re.select("id").collect().map(_.getString(0)).toSet
    assert(ids.contains("Q64"))
    assert(!ids.contains("Q90"))
  }

  test("readLimited: first N lines in FILE order, even when the scan splits") {
    import spark.implicits._
    // one ordered file big enough (compression-resistant filler) that a
    // 16 KB maxPartitionBytes scan genuinely splits it
    val lines = (0 until 5000).map { i =>
      s"""{"type":"item","id":"Q$i","labels":{"en":{"language":"en","value":"L${i * 2654435761L}"}}},"""
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_lim")
    java.nio.file.Files.write(dir.resolve("dump.json"),
      ("[\n" + lines.mkString("\n") + "\n]").getBytes("UTF-8"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val base = WikidataSource.readLines(spark, dir.toString)
      assert(base.rdd.getNumPartitions > 1, "fixture must force a split scan")
      val got = WikidataSource.readLimited(spark, dir.toString, 137)
        .select("id").collect().map(_.getString(0)).toSeq
      assert(got == (0 until 137).map(i => s"Q$i"), "exactly the first 137, in order")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
