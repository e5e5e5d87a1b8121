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

  /** Remove the stats sidecars so per-file [min, max] ranges on the
    * source column cannot prune the same files — the derived-partition
    * judgments must stand alone in these cases.
    */
  private def dropStats(t: String): Unit = {
    val fsys = VersionedTable.fs(spark, t)
    fsys.listStatus(new org.apache.hadoop.fs.Path(s"$t/_commits"))
      .filter(_.getPath.getName.endsWith(".stats"))
      .foreach(st => fsys.delete(st.getPath, false))
  }

  test("derived partition pruning: range bounds on the source column, monotone expression") {
    val t = newTable()
    VersionedTable.setGeneratedColumn(spark, t, "day", "CAST(ts AS DATE)")
    val rows = (0 until 96).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:30:00"))
    }
    VersionedTable.commit(rows.toDF("id", "ts"), t,
      partitionCols = Seq("day"))                          // 4 day dirs
    dropStats(t)
    val (df, idx) = GraftScan.readWithIndex(spark, t)
    val q = df.filter(
      $"ts" >= lit("2024-01-02 05:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-03 07:00:00").cast("timestamp"))
    assert(q.count() == 26)  // hours 05-23 of day 2 + 00-06 of day 3
    val expected = df.inputFiles.count(f =>
      f.contains("day=2024-01-02") || f.contains("day=2024-01-03"))
    assert(idx.lastListedCount == expected,
      s"derived prune must list only days 02-03: ${idx.lastListedCount}" +
        s" vs $expected of ${idx.totalFiles}")
    assert(expected < idx.totalFiles)
  }

  test("derived partition pruning: equality and IN derive for any deterministic expression; non-monotone ranges never prune") {
    val t = newTable()
    // CAST(double AS INT) is a narrowing cast — point-derivable only
    VersionedTable.setGeneratedColumn(spark, t, "bucket",
      "CAST(v / 100 AS INT)")
    VersionedTable.commit((0L until 300L).map(v => (v, v)).toDF("id", "v"),
      t, partitionCols = Seq("bucket"))
    dropStats(t)
    val (df, idx) = GraftScan.readWithIndex(spark, t)
    val q = df.filter($"v" === 150L)
    assert(q.count() == 1)
    val exp1 = df.inputFiles.count(_.contains("bucket=1"))
    assert(idx.lastListedCount == exp1 && exp1 < idx.totalFiles,
      s"equality must prune to the point's image bucket: " +
        s"${idx.lastListedCount} vs $exp1 of ${idx.totalFiles}")
    val q2 = df.filter($"v".isin(50L, 250L))
    assert(q2.count() == 2)
    val exp2 = df.inputFiles.count(f =>
      f.contains("bucket=0") || f.contains("bucket=2"))
    assert(idx.lastListedCount == exp2,
      s"IN must prune to the listed points' images: " +
        s"${idx.lastListedCount} vs $exp2")
    // a RANGE through the narrowing cast must NOT prune (outside the
    // monotone shapes) — full listing, correct rows, never a wrong prune
    val q3 = df.filter($"v" >= 250L)
    assert(q3.count() == 50)
    assert(idx.lastListedCount == idx.totalFiles,
      "a non-monotone shape must keep every partition")
  }

  test("derived pruning composes with column mapping and declines on multi-column expressions") {
    val t = newTable()
    VersionedTable.setGeneratedColumn(spark, t, "bucket",
      "CAST(v / 100 AS INT)")
    VersionedTable.commit((0L until 300L).map(v => (v, v)).toDF("id", "v"),
      t, partitionCols = Seq("bucket"))
    // rename the source column: pushed filters reach the scan in
    // PHYSICAL space (the mapping Project rewrites w -> v), which is
    // exactly the space the declared expression lives in — derivation
    // still prunes, on the renamed query column
    VersionedTable.renameColumn(spark, t, "v", "w")
    dropStats(t)
    val (df, idx) = GraftScan.readWithIndex(spark, t)
    val q = df.filter($"w" === 150L)
    assert(q.count() == 1)
    val exp = df.inputFiles.count(_.contains("bucket=1"))
    assert(idx.lastListedCount == exp && exp < idx.totalFiles,
      s"derivation must survive a source-column rename: " +
        s"${idx.lastListedCount} vs $exp")

    // a multi-column expression resolves against no single filter
    // attribute — derives nothing, full listing, correct rows
    val t2 = newTable()
    VersionedTable.setGeneratedColumn(spark, t2, "s", "CAST(a + b AS INT)")
    VersionedTable.commit(
      (0L until 40L).map(a => (a, a % 3, a % 5)).toDF("id", "a", "b"),
      t2, partitionCols = Seq("s"))
    dropStats(t2)
    val (df2, idx2) = GraftScan.readWithIndex(spark, t2)
    assert(df2.filter($"a" === 2L).count() == 13)
    assert(idx2.lastListedCount == idx2.totalFiles,
      "a multi-column expression must derive nothing")
  }
}
