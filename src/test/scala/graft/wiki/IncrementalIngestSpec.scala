package graft.wiki

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IncrementalIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("checkpointed ingest is incremental and idempotent") {
    val base = Files.createTempDirectory("graft_inc")
    val dumpDir = base.resolve("dump"); Files.createDirectories(dumpDir)
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    // first dump file: the standard fixture (4 surviving entities)
    Files.copy(Paths.get(TestSpark.resource("/fixtures/wikidata.json.bz2")),
      dumpDir.resolve("part1.json.bz2"), StandardCopyOption.REPLACE_EXISTING)

    IncrementalIngest.ingestEntities(spark, dumpDir.toString, outDir, ckpt)
    val n1 = spark.read.parquet(s"$outDir/entities").count()
    assert(n1 == 4)

    // rerun with no new files: nothing is re-ingested
    IncrementalIngest.ingestEntities(spark, dumpDir.toString, outDir, ckpt)
    assert(spark.read.parquet(s"$outDir/entities").count() == n1)

    // add a new dump file with one new entity -> exactly one new row
    val extra =
      """{"type": "item", "id": "Q999", "claims": {"P31": [{"mainsnak": {"datavalue": {"value": {"id": "Q515"}}}, "rank": "normal"}]}, "sitelinks": {"enwiki": {"title": "Newtown"}}, "labels": {"en": {"language": "en", "value": "Newtown"}}, "descriptions": {"en": {"language": "en", "value": "new city"}}, "aliases": {"en": [{"language": "en", "value": "NT"}]}},"""
    Files.writeString(dumpDir.resolve("part2.json"), extra + "\n")
    IncrementalIngest.ingestEntities(spark, dumpDir.toString, outDir, ckpt)
    val ents = spark.read.parquet(s"$outDir/entities")
    assert(ents.count() == n1 + 1)
    assert(ents.filter(org.apache.spark.sql.functions.col("id") === "Q999").count() == 1)
    // alias seeds accumulated too
    val seeds = spark.read.parquet(s"$outDir/alias_seeds")
    assert(seeds.filter(org.apache.spark.sql.functions.col("alias") === "NT").count() == 1)
  }
}
