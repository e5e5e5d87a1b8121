package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Generated columns: filled from their expression on every ingest
  * path when absent, constraint-validated when supplied, usable as a
  * partition column (the date-from-timestamp layout idiom), carried by
  * clones.
  */
class GeneratedColumnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newTable(): String =
    graft.Caches.newTempDir("gen_spec").toString + "/t"

  test("fill on ingest, partition on the generated column, prune on read") {
    val t = newTable()
    VersionedTable.setGeneratedColumn(spark, t, "bucket",
      "CAST(v / 100 AS INT)")
    VersionedTable.commit(
      Seq((1L, 50L), (2L, 150L), (3L, 250L)).toDF("id", "v"), t,
      partitionCols = Seq("bucket"))                               // v0
    val out = VersionedTable.read(spark, t)
    assert(out.columns.toSet == Set("id", "v", "bucket"))
    assert(out.select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(out.inputFiles.forall(_.contains("bucket=")),
      "the generated column must lay the table out")
    // appends fill too; the layout extends
    VersionedTable.append(Seq((4L, 199L)).toDF("id", "v"), t,
      partitionCols = Seq("bucket"))
    assert(VersionedTable.read(spark, t)
      .filter($"bucket" === 1).collect().map(_.getLong(0)).toSet ==
      Set(2L, 4L))
    // SQL INSERT leaves the derived column to the commit
    graft.sql.GraftSql.run(spark,
      s"INSERT INTO graft.`$t` VALUES (5, 325)")
    assert(VersionedTable.read(spark, t)
      .filter($"id" === 5L).head().getInt(2) == 3)
  }

  test("supplied values validate through the CHECK gate; clones carry the declaration") {
    val t = newTable()
    VersionedTable.setGeneratedColumn(spark, t, "b", "v % 10")
    VersionedTable.commit(Seq((1L, 42L)).toDF("id", "v"), t)
    // correct supplied value passes
    VersionedTable.append(Seq((2L, 53L, 3L)).toDF("id", "v", "b"), t)
    // wrong supplied value aborts LOUD with nothing claimed
    val before = VersionedTable.versions(spark, t).max
    val e = intercept[Exception] {
      VersionedTable.append(Seq((3L, 64L, 9L)).toDF("id", "v", "b"), t)
    }
    assert(e.getMessage.contains("gen_b"))
    assert(VersionedTable.versions(spark, t).max == before,
      "a violating generated value must not commit")
    assert(VersionedTable.generatedColumns(spark, t) ==
      Map("b" -> "v % 10"))
    // the clone fills and validates like the source
    val c = newTable()
    VersionedTable.cloneTable(spark, t, c)
    VersionedTable.append(Seq((4L, 77L)).toDF("id", "v"), c)
    assert(VersionedTable.read(spark, c)
      .filter($"id" === 4L).head().getLong(2) == 7L)
    intercept[Exception] {
      VersionedTable.append(Seq((5L, 88L, 1L)).toDF("id", "v", "b"), c)
    }
  }
}
