package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.VersionedTable

/** The SQL verb surface: OPTIMIZE / VACUUM / RESTORE / ALTER TABLE
  * RENAME|DROP COLUMN / DESCRIBE HISTORY over `` graft.`/path` `` refs
  * and catalog names, through both entry points (GraftSql.run and a
  * session carrying the parser extension). Non-verb statements fall
  * through to Spark's parser untouched.
  */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newTable(tag: String): String =
    graft.Caches.newTempDir(s"gsql_$tag").toString + "/t"

  private val base = Seq(
    (1L, "mon", 10.0), (2L, "mon", 20.0),
    (3L, "tue", 30.0), (4L, "tue", 40.0),
    (5L, "wed", 50.0)
  ).toDF("id", "day", "value")

  test("ALTER TABLE graft.`path` RENAME/DROP COLUMN are metadata commits") {
    val t = newTable("alter")
    VersionedTable.commit(base, t)
    val v1 = GraftSql.run(spark, s"ALTER TABLE graft.`$t` RENAME COLUMN value TO amount")
    assert(v1.head().getInt(0) == 1)
    val df = VersionedTable.read(spark, t)
    assert(df.columns.contains("amount") && !df.columns.contains("value"))
    GraftSql.run(spark, s"ALTER TABLE graft.`$t` DROP COLUMN amount")
    assert(!VersionedTable.read(spark, t).columns.contains("amount"))
    // both verbs were manifest-only: no new data dir appeared
    assert(new java.io.File(s"$t/data").listFiles().count(_.isDirectory) == 1)
  }

  test("RESTORE TABLE ... TO VERSION AS OF rolls the head back") {
    val t = newTable("restore")
    VersionedTable.commit(base, t)
    VersionedTable.append(Seq((6L, "thu", 60.0)).toDF("id", "day", "value"), t)
    assert(VersionedTable.read(spark, t).count() == 6)
    GraftSql.run(spark, s"RESTORE TABLE graft.`$t` TO VERSION AS OF 0")
    assert(VersionedTable.read(spark, t).count() == 5)
  }

  test("OPTIMIZE WHERE packs only the named partition; ZORDER accepted") {
    val t = newTable("opt")
    VersionedTable.commit(base, t, Some("day"))
    VersionedTable.append(Seq((6L, "mon", 60.0)).toDF("id", "day", "value"),
      t, Some("day"))
    VersionedTable.append(Seq((7L, "mon", 70.0)).toDF("id", "day", "value"),
      t, Some("day"))
    def files(day: String): Set[String] =
      VersionedTable.read(spark, t).inputFiles
        .filter(_.contains(s"/day=$day/")).toSet
    val preMon = files("mon"); val preTue = files("tue")
    assert(preMon.size >= 3)
    GraftSql.run(spark,
      s"OPTIMIZE graft.`$t` WHERE day = 'mon' ZORDER BY (id, value)")
    assert(files("mon").size < preMon.size)
    assert(files("tue") == preTue, "untouched partition must carry forward")
    assert(VersionedTable.read(spark, t).count() == 7)
  }

  test("full OPTIMIZE preserves a partitioned table's hive layout") {
    val t = newTable("optfull")
    VersionedTable.commit(base, t, Some("day"))
    VersionedTable.append(Seq((6L, "mon", 60.0)).toDF("id", "day", "value"),
      t, Some("day"))
    GraftSql.run(spark, s"OPTIMIZE graft.`$t`")
    val files = VersionedTable.read(spark, t).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/day=")),
      "a statement-level OPTIMIZE must not flatten the partition layout")
    assert(VersionedTable.read(spark, t).count() == 6)
    // and the packed table still partition-prunes through the index
    val (df, idx) = graft.catalog.GraftScan.readWithIndex(spark, t)
    assert(df.filter($"day" === "mon").count() == 3)
    assert(idx.lastListedCount < idx.totalFiles)
  }

  test("DESCRIBE HISTORY lists the version ladder; VACUUM RETAIN runs") {
    val t = newTable("hist")
    VersionedTable.commit(base, t)
    VersionedTable.append(Seq((6L, "thu", 60.0)).toDF("id", "day", "value"), t)
    val h = GraftSql.run(spark, s"DESCRIBE HISTORY graft.`$t`")
    assert(h.select("version").collect().map(_.getInt(0)).toSet == Set(0, 1))
    assert(h.filter($"op" === "append").count() == 1)
    GraftSql.run(spark, s"VACUUM graft.`$t` RETAIN 168 HOURS")
    assert(VersionedTable.read(spark, t).count() == 6)
  }

  test("VACUUM DRY RUN reports the sweep set and deletes nothing; the real sweep matches") {
    val t = newTable("vacdry")
    VersionedTable.commit(base, t)                                  // v0
    VersionedTable.commit(Seq((8L, "sat", 80.0))
      .toDF("id", "day", "value"), t)                               // v1
    VersionedTable.commit(Seq((9L, "sun", 90.0))
      .toDF("id", "day", "value"), t)                               // v2
    def local(p: String): java.io.File =
      new java.io.File(p.stripPrefix("file:"))
    val dry = GraftSql.run(spark, s"VACUUM graft.`$t` DRY RUN").collect()
    val kinds = dry.map(_.getString(0)).toSet
    assert(kinds.contains("manifest") && kinds.contains("data_file"),
      s"expected v0's manifest + files on the sweep list, got $kinds")
    val dataFiles = dry.filter(_.getString(0) == "data_file")
      .map(_.getString(1))
    // NOTHING was deleted: the swept-listed files still exist and v0
    // still time-travels
    dataFiles.foreach(f => assert(local(f).exists(), s"dry run deleted $f"))
    assert(VersionedTable.read(spark, t, 0).count() == 5)
    // the real sweep removes exactly what the dry run promised
    GraftSql.run(spark, s"VACUUM graft.`$t`")
    dataFiles.foreach(f =>
      assert(!local(f).exists(), s"real vacuum kept $f"))
    assert(VersionedTable.read(spark, t).count() == 1)
    intercept[Exception] { VersionedTable.read(spark, t, 0).count() }
  }

  test("CLONE forks the table at a retained version, independently writable") {
    val t = newTable("clone_src")
    val dst = newTable("clone_dst")
    VersionedTable.commit(base, t)
    VersionedTable.append(Seq((6L, "thu", 60.0)).toDF("id", "day", "value"), t)
    GraftSql.run(spark, s"CLONE graft.`$t` TO graft.`$dst` VERSION AS OF 0")
    assert(VersionedTable.read(spark, dst).count() == 5)
    // the fork has its own commit log: writes diverge
    VersionedTable.append(Seq((9L, "fri", 90.0)).toDF("id", "day", "value"),
      dst)
    assert(VersionedTable.read(spark, dst).count() == 6)
    assert(VersionedTable.read(spark, t).count() == 6) // src untouched
    assert(VersionedTable.read(spark, t).select("id").collect()
      .map(_.getLong(0)).toSet != VersionedTable.read(spark, dst)
      .select("id").collect().map(_.getLong(0)).toSet)
  }

  test("catalog-name refs resolve through USING graft; schema verbs sync the catalog") {
    val t = newTable("cat")
    VersionedTable.commit(base, t)
    spark.sql("DROP TABLE IF EXISTS gsql_cat_t")
    spark.sql(s"CREATE TABLE gsql_cat_t USING graft OPTIONS (path '$t')")
    try {
      GraftSql.run(spark,
        "ALTER TABLE gsql_cat_t RENAME COLUMN value TO amount")
      // the catalog schema was synced: SQL reads keep working and see
      // the LOGICAL name
      val out = spark.sql(
        "SELECT sum(amount) AS s FROM gsql_cat_t").head().getDouble(0)
      assert(out == 150.0)
      GraftSql.run(spark, "DESCRIBE HISTORY gsql_cat_t").collect()
    } finally spark.sql("DROP TABLE IF EXISTS gsql_cat_t")
  }


  test("GraftSql.run serves SELECT FROM graft.`path` without the extension") {
    val t = newTable("runpath")
    VersionedTable.commit(base, t, Some("day"))
    val out = GraftSql.run(spark,
      s"SELECT id, day, value FROM graft.`$t` WHERE day = 'mon'")
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(GraftSql.run(spark, s"SELECT count(*) AS n FROM graft.`$t`")
      .head().getLong(0) == 5L)
  }

  test("non-verb statements and non-graft ALTERs fall through to Spark") {
    assert(GraftSql.run(spark, "SELECT 1 AS one").head().getInt(0) == 1)
    // ALTER TABLE on a non-graft table is the delegate's business
    spark.sql("DROP TABLE IF EXISTS gsql_plain_t")
    spark.sql("CREATE TABLE gsql_plain_t (id INT) USING parquet")
    try {
      GraftSql.run(spark,
        "ALTER TABLE gsql_plain_t RENAME COLUMN id TO id2")
      assert(spark.table("gsql_plain_t").columns.toSeq == Seq("id2") ||
        spark.table("gsql_plain_t").columns.toSeq == Seq("id"))
    } catch {
      // v1 parquet tables may refuse RENAME COLUMN — the point is the
      // statement reached SPARK's resolution, not the graft verb
      case e: Exception =>
        assert(!e.getMessage.contains("no versioned table"))
    } finally spark.sql("DROP TABLE IF EXISTS gsql_plain_t")
  }

  test("the session extension injects the parser: plain spark.sql runs the verbs") {
    val t = newTable("ext")
    VersionedTable.commit(base, t)
    // a second session over the SAME SparkContext, built with the
    // extension. withExtensions (not the spark.sql.extensions conf —
    // that one is STATIC, read only at SparkContext creation); and
    // getOrCreate only builds a NEW session when the active/default
    // slots are clear, so clear them for the build and restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
    val v = s2.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN value TO amount")
    assert(v.head().getInt(0) == 1)
    assert(VersionedTable.read(spark, t).columns.contains("amount"))
    val h = s2.sql(s"DESCRIBE HISTORY graft.`$t`")
    assert(h.count() == 2)
    // the resolution rule serves FROM graft.`path` refs (through the
    // column mapping: the renamed name resolves)
    val sel = s2.sql(
      s"SELECT id, amount FROM graft.`$t` WHERE day = 'mon'")
    assert(sel.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(s2.sql(s"SELECT count(*) AS n FROM graft.`$t`")
      .head().getLong(0) == 5L)
    // and ordinary SQL still parses through the delegate
    assert(s2.sql("SELECT 2 AS two").head().getInt(0) == 2)
  }
}
