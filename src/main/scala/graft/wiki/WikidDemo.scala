package graft.wiki

import org.apache.spark.sql.SparkSession

/** CLI entry point running the full wikid-parity pipeline on a pair of dump
  * files: dumps -> entities/properties/aliases/articles/annotations ->
  * KB tables. Usage:
  *
  *   runMain graft.wiki.WikidDemo <wikidata.json[.bz2]> <wikipedia.xml[.bz2]> <outDir>
  */
object WikidDemo {
  def main(args: Array[String]): Unit = {
    val Array(wikidataPath, wikipediaPath, outDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("wikid-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ents = EntitiesJob.fromDump(spark, wikidataPath)
    val pages = WikipediaSource.read(spark, wikipediaPath)
    val titleMap = Queries.titleMap(ents.entities)
    val aliases = AliasesJob.run(ents.aliases, pages, titleMap)
    val arts = ArticlesJob.run(pages, titleMap)
    val loaded = Queries.loadEntities(ents.entities, arts.articles, aliases)

    ents.entities.write.mode("overwrite").parquet(s"$outDir/entities")
    ents.properties.write.mode("overwrite").parquet(s"$outDir/properties")
    aliases.write.mode("overwrite").parquet(s"$outDir/aliases")
    arts.articles.write.mode("overwrite").parquet(s"$outDir/articles")
    arts.annotations.write.mode("overwrite").parquet(s"$outDir/annotations")
    Kb.kbEntities(loaded).write.mode("overwrite").parquet(s"$outDir/kb_entities")
    Kb.kbAliases(aliases, loaded).write.mode("overwrite").parquet(s"$outDir/kb_aliases")
    Kb.writeDescriptions(loaded, s"$outDir/descriptions")

    println("== entities =="); ents.entities.show(5, truncate = 40)
    println("== aliases =="); aliases.orderBy("alias").show(20)
    println("== priors =="); Queries.aliasPriors(aliases).orderBy("alias").show(10, truncate = 60)
    println("== articles =="); arts.articles.select("entity_id", "title").show(5)
    println(s"counts: entities=${ents.entities.count()} properties=${ents.properties.count()} " +
      s"aliases=${aliases.count()} articles=${arts.articles.count()} " +
      s"annotations=${arts.annotations.count()}")
    spark.stop()
  }
}
