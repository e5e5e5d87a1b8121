package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-hygiene registry: staged frames really persist, release really
  * drops them, and the operators that stage internally (minhash/simhash
  * dedup, EntitiesJob singleScan) leave nothing behind after a
  * releaseAll — the per-query contract the harness loops rely on.
  */
class CachesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stage persists; release/releaseAll drop every block") {
    Caches.releaseAll(spark)
    val before = Caches.leakedRddCount(spark)
    val df = Caches.stage(spark.range(1000).toDF("n"))
    df.count()
    assert(Caches.leakedRddCount(spark) > before, "stage must persist")
    Caches.releaseAll(spark)
    assert(Caches.leakedRddCount(spark) == 0)
  }

  test("dedup operators + singleScan ingest leave zero blocks after releaseAll") {
    import spark.implicits._
    Caches.releaseAll(spark)
    val docs = (0 until 200)
      .map(i => (i.toLong, s"token$i alpha beta gamma delta epsilon tok${i % 7}"))
      .toDF("doc_id", "text")
    graft.ext.Dedup.minhashDupPairs(docs, "doc_id", "text").count()
    graft.ext.Dedup.simhashDupPairs(docs, "doc_id", "text").count()
    assert(Caches.leakedRddCount(spark) > 0, "operators stage internally")
    Caches.releaseAll(spark)
    assert(Caches.leakedRddCount(spark) == 0)

    // EntitiesJob singleScan: the advertised release handle works
    val raw = wiki.WikidataSource.read(spark,
      TestSpark.resource("/fixtures") + "/wikidata.json.bz2")
    val r = wiki.EntitiesJob.run(raw, singleScan = true)
    r.entities.count(); r.properties.count(); r.aliases.count()
    assert(Caches.leakedRddCount(spark) > 0)
    r.release()
    assert(Caches.leakedRddCount(spark) == 0)
  }

  test("scoped release drops only the scope's frames, not concurrent staging") {
    Caches.releaseAll(spark)
    // an "outer query" (e.g. a bench) stages a frame globally
    val outer = Caches.stage(spark.range(500).toDF("n"))
    outer.count()
    val outerLevel = outer.storageLevel
    assert(outerLevel.useMemory || outerLevel.useDisk)
    // a foreachBatch-style scope stages and computes its own frames
    var inner: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      inner = Caches.stage(spark.range(100).toDF("m"))
      inner.count()
      assert(inner.storageLevel.useMemory || inner.storageLevel.useDisk)
    }
    // scope exit dropped the batch frame ...
    assert(inner.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "scope-staged frame must be unpersisted at scope exit")
    // ... and left the concurrent query's cache alone
    assert(outer.storageLevel == outerLevel,
      "globally staged frames must survive a scope's cleanup")
    Caches.releaseAll(spark)
    assert(Caches.leakedRddCount(spark) == 0)
  }

  test("newTempDir registers and deleteNow removes recursively") {
    val d = Caches.newTempDir("graft_cachespec")
    java.nio.file.Files.writeString(d.resolve("f.txt"), "x")
    java.nio.file.Files.createDirectory(d.resolve("sub"))
    java.nio.file.Files.writeString(d.resolve("sub/g.txt"), "y")
    Caches.deleteNow(d)
    assert(!java.nio.file.Files.exists(d))
  }
}
