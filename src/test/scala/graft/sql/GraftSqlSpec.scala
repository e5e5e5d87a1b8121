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
    VersionedTable.commit(base, t, Seq("day"))
    VersionedTable.append(Seq((6L, "mon", 60.0)).toDF("id", "day", "value"),
      t, Seq("day"))
    VersionedTable.append(Seq((7L, "mon", 70.0)).toDF("id", "day", "value"),
      t, Seq("day"))
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
    VersionedTable.commit(base, t, Seq("day"))
    VersionedTable.append(Seq((6L, "mon", 60.0)).toDF("id", "day", "value"),
      t, Seq("day"))
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
    // BARE vacuum defaults to RETAIN 168 HOURS (the Delta default):
    // every just-committed version is inside the wall-clock window, so
    // the sweep set is EMPTY — an aggressive sweep needs an explicit
    // RETAIN 0 HOURS
    val bare = GraftSql.run(spark, s"VACUUM graft.`$t` DRY RUN").collect()
    assert(!bare.exists(_.getString(0) == "data_file"),
      s"bare VACUUM must retain in-window versions, listed: ${bare.toSeq}")
    GraftSql.run(spark, s"VACUUM graft.`$t`")
    assert(VersionedTable.read(spark, t, 0).count() == 5,
      "a bare VACUUM must keep v0 time-travelable (168 h retention)")
    val dry = GraftSql.run(spark,
      s"VACUUM graft.`$t` RETAIN 0 HOURS DRY RUN").collect()
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
    GraftSql.run(spark, s"VACUUM graft.`$t` RETAIN 0 HOURS")
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
    VersionedTable.commit(base, t, Seq("day"))
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

  test("SQL time travel: FROM graft.`path` VERSION/TIMESTAMP AS OF serves the snapshot") {
    val t = newTable("tt")
    VersionedTable.commit(base, t)                                    // v0
    val before = System.currentTimeMillis()
    Thread.sleep(5)
    VersionedTable.append(Seq((6L, "thu", 60.0))
      .toDF("id", "day", "value"), t)                                 // v1
    assert(GraftSql.run(spark,
      s"SELECT count(*) AS n FROM graft.`$t` VERSION AS OF 0")
      .head().getLong(0) == 5L)
    assert(GraftSql.run(spark,
      s"SELECT count(*) AS n FROM graft.`$t` VERSION AS OF 1")
      .head().getLong(0) == 6L)
    // epoch-millis timestamp resolves the at-or-before version
    assert(GraftSql.run(spark,
      s"SELECT count(*) AS n FROM graft.`$t` TIMESTAMP AS OF '$before'")
      .head().getLong(0) == 5L)
    // joins between two snapshots of the SAME table work (the CDC-diff
    // query shape)
    val diff = GraftSql.run(spark,
      s"""SELECT cur.id FROM graft.`$t` VERSION AS OF 1 cur
         |LEFT ANTI JOIN graft.`$t` VERSION AS OF 0 old
         |ON cur.id = old.id""".stripMargin)
    assert(diff.collect().map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT drive the CHECK gate through SQL") {
    val t = newTable("constr")
    VersionedTable.commit(base, t)
    GraftSql.run(spark,
      s"ALTER TABLE graft.`$t` ADD CONSTRAINT val_pos CHECK (value > 0)")
    // the gate is live: a violating SQL INSERT aborts with no version
    val e = intercept[Exception] {
      GraftSql.run(spark, s"INSERT INTO graft.`$t` VALUES (9, 'x', -1.0)")
    }
    assert(e.getMessage.contains("val_pos"), e.getMessage)
    assert(VersionedTable.versions(spark, t) == Seq(0))
    // adding a constraint existing rows violate fails loud
    val e2 = intercept[Exception] {
      GraftSql.run(spark,
        s"ALTER TABLE graft.`$t` ADD CONSTRAINT big CHECK (value > 100)")
    }
    assert(e2.getMessage.contains("existing row"))
    GraftSql.run(spark,
      s"ALTER TABLE graft.`$t` DROP CONSTRAINT IF EXISTS val_pos")
    GraftSql.run(spark, s"INSERT INTO graft.`$t` VALUES (9, 'x', -1.0)")
    assert(VersionedTable.read(spark, t).count() == 6)
  }

  test("CTAS: CREATE TABLE ... USING graft AS SELECT commits through the protocol") {
    val t = newTable("ctas")
    spark.sql("DROP TABLE IF EXISTS gsql_ctas_t")
    spark.sql(
      s"""CREATE TABLE gsql_ctas_t USING graft OPTIONS (path '$t')
         |AS SELECT * FROM VALUES (1L, 'a', 1.0), (2L, 'b', 2.0)
         |  AS v(id, day, value)""".stripMargin)
    try {
      assert(VersionedTable.versions(spark, t) == Seq(0),
        "CTAS must land as one committed version")
      assert(spark.sql("SELECT count(*) AS n FROM gsql_ctas_t")
        .head().getLong(0) == 2L)
      assert(VersionedTable.read(spark, t).count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS gsql_ctas_t")
  }

  test("CTAS with PARTITIONED BY lands the multi-level layout in the manifest") {
    // Spark's DSv1 CTAS silently DROPS the partitioning before it
    // reaches the provider — the claim must carry it through, or the
    // created table loses its pruning with no error
    val t = newTable("ctaspart")
    spark.sql("DROP TABLE IF EXISTS gsql_ctasp_t")
    GraftSql.run(spark,
      s"""CREATE TABLE gsql_ctasp_t USING graft OPTIONS (path '$t')
         |PARTITIONED BY (day, bucket)
         |AS SELECT * FROM VALUES (1L, 'mon', 0, 1.0), (2L, 'mon', 1, 2.0),
         |  (3L, 'tue', 0, 3.0) AS v(id, day, bucket, value)""".stripMargin)
    try {
      assert(VersionedTable.layoutPartitionCols(spark, t) ==
        Seq("day", "bucket"))
      assert(VersionedTable.read(spark, t).inputFiles.forall(f =>
        f.matches(".*/day=[^/]+/bucket=[^/]+/[^/]+$")),
        "CTAS files must nest day=/bucket=/")
      // and the created table prunes on both levels through the index
      val (df, idx) = graft.catalog.GraftScan.readWithIndex(spark, t)
      assert(df.filter($"day" === "mon" && $"bucket" === 1)
        .select("id").head().getLong(0) == 2L)
      assert(idx.lastListedCount < idx.totalFiles)
      // non-column transforms fail loud, never silently flatten
      // (bucket(n, c) is the one exception — it IS the CLUSTERED BY
      // declaration, pinned in its own test)
      val e = intercept[IllegalArgumentException] {
        GraftSql.run(spark,
          s"""CREATE TABLE gsql_ctasp_bad USING graft
             |OPTIONS (path '${newTable("ctasbad")}')
             |PARTITIONED BY (days(id))
             |AS SELECT 1L AS id""".stripMargin)
      }
      assert(e.getMessage.contains("plain columns"))
    } finally spark.sql("DROP TABLE IF EXISTS gsql_ctasp_t")
  }

  test("INSERT OVERWRITE PARTITION replaces exactly the named slice; INSERT INTO PARTITION appends literals") {
    val t = newTable("inspart")
    VersionedTable.commit(base, t, Seq("day"))
    val preTue = VersionedTable.read(spark, t).inputFiles
      .filter(_.contains("/day=tue/")).toSet
    // scoped replace: day=mon swaps wholesale, day=tue/wed carry by ref
    GraftSql.run(spark,
      s"""INSERT OVERWRITE graft.`$t` PARTITION (day='mon')
         |SELECT * FROM VALUES (10L, 100.0), (11L, 110.0) AS v(id, value)""".stripMargin)
    val out = VersionedTable.read(spark, t).select("id", "day")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((3L, "tue"), (4L, "tue"), (5L, "wed"),
      (10L, "mon"), (11L, "mon")))
    assert(preTue.subsetOf(VersionedTable.read(spark, t).inputFiles.toSet),
      "day=tue files must carry forward by manifest reference")
    // static-spec INSERT INTO: literal partition column appended
    GraftSql.run(spark,
      s"INSERT INTO graft.`$t` PARTITION (day='thu') VALUES (12, 120.0)")
    assert(VersionedTable.read(spark, t)
      .filter($"day" === "thu").select("id").head().getLong(0) == 12L)
    // a batch row OUTSIDE the replaceWhere predicate fails loud
    val e = intercept[Exception] {
      VersionedTable.replaceWhere(
        Seq((13L, "fri", 1.0), (14L, "sat", 2.0))
          .toDF("id", "day", "value"), t, "day = 'fri'")
    }
    assert(e.getMessage.contains("OUTSIDE the predicate"))
    // dynamic specs fail loud, never silently misroute
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.run(spark,
        s"INSERT OVERWRITE graft.`$t` PARTITION (day) VALUES (1, 1.0, 'x')")
    }
    assert(e2.getMessage.contains("dynamic PARTITION"))
    // CTAS-by-INSERT with a spec: the statement's own spec declares the
    // new table's layout
    val fresh = newTable("insfresh")
    GraftSql.run(spark,
      s"INSERT INTO graft.`$fresh` PARTITION (day='mon') VALUES (1, 1.0)")
    assert(VersionedTable.layoutPartitionCols(spark, fresh) == Seq("day"))
  }

  test("replaceWhere: partition-only predicates swap by metadata; data predicates rewrite survivors") {
    val t = newTable("replw")
    VersionedTable.commit(base, t, Seq("day"))
    // partition-only predicate: no survivors scan, whole dirs swap
    val v1 = VersionedTable.replaceWhere(
      Seq((20L, "mon", 200.0)).toDF("id", "day", "value"), t,
      "day = 'mon'")
    assert(v1 == 1)
    assert(VersionedTable.read(spark, t).filter($"day" === "mon")
      .select("id").head().getLong(0) == 20L)
    assert(VersionedTable.read(spark, t).count() == 4)
    // data predicate: matching rows vanish, non-matching rows of the
    // touched files survive the rewrite
    VersionedTable.replaceWhere(
      Seq((30L, "tue", 999.0)).toDF("id", "day", "value"), t,
      "value >= 40 AND value <= 1000")
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
      .map(_.getLong(0))
    // 4 (40.0), 5 (50.0), 20 (200.0) replaced by 30; 3 (30.0) survives
    assert(out.toSeq == Seq(3L, 30L))
    // df.write with the replaceWhere option drives the same verb
    Seq((40L, "tue", 500.0)).toDF("id", "day", "value")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "value >= 400 AND value <= 1000").save(t)
    assert(VersionedTable.read(spark, t).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(3L, 40L))
  }

  test("SHOW PARTITIONS lists the head snapshot's tuples from metadata") {
    val t = newTable("showpart")
    val data = Seq((1L, "en", 0, 1.0), (2L, "en", 1, 2.0),
      (3L, "nl", 0, 3.0)).toDF("id", "lang", "bucket", "value")
    VersionedTable.commit(data, t, Seq("lang", "bucket"))
    val parts = GraftSql.run(spark, s"SHOW PARTITIONS graft.`$t`")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("lang=en/bucket=0", "lang=en/bucket=1",
      "lang=nl/bucket=0"))
    // unpartitioned tables fail loud (Spark's own contract)
    val flat = newTable("showflat")
    VersionedTable.commit(base, flat)
    val e = intercept[Exception] {
      GraftSql.run(spark, s"SHOW PARTITIONS graft.`$flat`").collect()
    }
    assert(e.getMessage.contains("not partitioned"))
  }

  test("OPTIMIZE WHERE with AND-ed levels packs exactly one leaf of a two-level layout") {
    val t = newTable("optleaf")
    val data = Seq((1L, "en", 0, 1.0), (2L, "en", 1, 2.0),
      (3L, "nl", 0, 3.0)).toDF("id", "lang", "bucket", "value")
    VersionedTable.commit(data, t, Seq("lang", "bucket"))
    VersionedTable.append(Seq((4L, "en", 1, 4.0))
      .toDF("id", "lang", "bucket", "value"), t, Seq("lang", "bucket"))
    VersionedTable.append(Seq((5L, "en", 1, 5.0))
      .toDF("id", "lang", "bucket", "value"), t, Seq("lang", "bucket"))
    def leaf(): Set[String] = VersionedTable.read(spark, t).inputFiles
      .filter(f => f.contains("/lang=en/") && f.contains("/bucket=1/"))
      .toSet
    def others(): Set[String] = VersionedTable.read(spark, t).inputFiles
      .filterNot(f => f.contains("/lang=en/") && f.contains("/bucket=1/"))
      .toSet
    val preLeaf = leaf(); val preOthers = others()
    assert(preLeaf.size >= 3)
    GraftSql.run(spark,
      s"OPTIMIZE graft.`$t` WHERE lang = 'en' AND bucket = '1'")
    assert(leaf().size < preLeaf.size, "the scoped leaf must pack")
    assert(others() == preOthers,
      "every other leaf must carry forward by reference")
    assert(VersionedTable.read(spark, t).count() == 5)
    assert(VersionedTable.read(spark, t).inputFiles.forall(f =>
      f.matches(".*/lang=[^/]+/bucket=[^/]+/[^/]+$")))
  }

  test("CONVERT TO GRAFT adopts a plain parquet tree in place, zero copy") {
    val root = graft.Caches.newTempDir("gsql_convert").toString + "/lake"
    // a pre-existing hive-partitioned parquet lake, written by plain Spark
    base.write.partitionBy("day").parquet(root)
    val preBytes = new java.io.File(root).listFiles().length
    assert(preBytes > 0)
    val v = GraftSql.run(spark, s"CONVERT TO GRAFT parquet.`$root`")
    assert(v.head().getInt(0) == 0)
    // the adopted table reads identically, keeps its layout, and the
    // whole lakehouse surface works on it immediately
    assert(VersionedTable.layoutPartitionCols(spark, root) == Seq("day"))
    val out = VersionedTable.read(spark, root).select("id", "day", "value")
    assert(out.count() == 5)
    assert(out.filter($"day" === "mon").count() == 2)
    GraftSql.run(spark, s"DELETE FROM graft.`$root` WHERE id = 1")
    assert(VersionedTable.read(spark, root).count() == 4)
    assert(VersionedTable.read(spark, root, 0).count() == 5,
      "the pre-DML snapshot must time-travel")
    // stats were harvested at adoption: the indexed scan prunes
    val (df, idx) = graft.catalog.GraftScan.readWithIndex(spark, root)
    assert(df.filter($"day" === "tue").count() == 2)
    assert(idx.lastListedCount < idx.totalFiles)
    // converting twice fails loud
    val e = intercept[IllegalArgumentException] {
      GraftSql.run(spark, s"CONVERT TO GRAFT parquet.`$root`")
    }
    assert(e.getMessage.contains("already a versioned table"))
  }

  test("table_changes TVF serves the change feed through plain SQL") {
    val t = newTable("tvf")
    VersionedTable.commit(base, t)                                  // v0
    GraftSql.run(spark, s"INSERT INTO graft.`$t` VALUES (6, 'thu', 60.0)") // v1
    GraftSql.run(spark, s"DELETE FROM graft.`$t` WHERE id = 1")     // v2
    val out = GraftSql.run(spark,
      s"""SELECT id, _change_type, _commit_version
         |FROM table_changes('$t', 1, 2) ORDER BY _commit_version, id"""
        .stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq((6L, "insert", 1), (1L, "delete", 2)))
    // composable as a relation: aggregate + join over the feed
    val n = GraftSql.run(spark,
      s"""SELECT count(*) AS n FROM table_changes('$t', 0)
         |WHERE _change_type = 'insert'""".stripMargin)
      .head().getLong(0)
    assert(n == 6L) // 5 base + 1 insert (the delete adds a delete row)
    // non-literal args fail loud
    val e = intercept[IllegalArgumentException] {
      GraftSql.run(spark,
        s"SELECT * FROM table_changes('$t', id)").collect()
    }
    assert(e.getMessage.contains("literal arguments"))
    // timestamp bounds resolve to the version live at that instant:
    // a now-ish end timestamp covers the whole ladder
    val nowMs = System.currentTimeMillis + 60000
    val tsOut = GraftSql.run(spark,
      s"SELECT count(*) AS n FROM table_changes('$t', 1, '$nowMs')")
      .head().getLong(0)
    assert(tsOut == out.length,
      s"timestamp end bound must cover the window, got $tsOut")
    // a START timestamp resolves at-or-AFTER (the Delta contract —
    // changes strictly before the instant are never replayed): an
    // epoch-start bound begins at version 0, the full feed
    val fromEpoch = GraftSql.run(spark,
      "SELECT count(*) AS n FROM " +
        s"table_changes('$t', '1970-01-01T00:00:00Z')")
      .head().getLong(0)
    assert(fromEpoch == 7L, // 5 base + 1 insert + 1 delete row
      s"epoch start bound must begin at v0, got $fromEpoch")
    // and a future start bound has no commit at-or-after it: loud
    val ef = intercept[IllegalArgumentException] {
      GraftSql.run(spark,
        s"SELECT * FROM table_changes('$t', '$nowMs')").collect()
    }
    assert(ef.getMessage.contains("at-or-after"))
  }

  test("DESCRIBE DETAIL reports head-snapshot operational metadata") {
    val t = newTable("detail")
    VersionedTable.commit(base, t, Seq("day"))
    VersionedTable.setConstraint(spark, t, "pos_value", "value > 0")
    VersionedTable.append(Seq((6L, "thu", 60.0)).toDF("id", "day", "value"),
      t, Seq("day"))
    val r = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t`").head()
    assert(r.getString(0) == t)
    assert(r.getInt(1) == 1)                        // head version
    assert(r.getLong(2) ==
      VersionedTable.read(spark, t).inputFiles.length.toLong)
    assert(r.getLong(3) > 0)                        // bytes
    assert(r.getString(4) == "day")                 // layout
    assert(r.getLong(5) == 4)                       // mon/tue/wed/thu
    assert(r.getString(6) == "pos_value CHECK (value > 0)")
    assert(r.getLong(7) <= r.getLong(8))            // created <= last
    assert(r.getLong(9) == 0)                       // no deletion vectors
  }

  test("property sweep: non-verb statements are byte-identically delegated, never claimed") {
    val delegate = org.apache.spark.sql.graft.SqlBridge.sessionParser(spark)
    val stmts = Seq(
      "SELECT 1",
      "SELECT 'OPTIMIZE graft.`x`' AS s",
      "SELECT * FROM VALUES (1,'a') AS t(i,s) WHERE s <> 'VACUUM graft.`p`'",
      "CREATE TABLE IF NOT EXISTS prop_x (id INT) USING parquet",
      "DROP TABLE IF EXISTS prop_x",
      "WITH c AS (SELECT 2 AS two) SELECT two FROM c",
      // non-graft DML belongs to Spark (claim probes the catalog)
      "INSERT INTO prop_plain VALUES (1)",
      "DELETE FROM prop_plain WHERE id = 1",
      "UPDATE prop_plain SET id = 2",
      "MERGE INTO prop_plain t USING prop_plain s ON t.id = s.id " +
        "WHEN MATCHED THEN DELETE",
      "ALTER TABLE prop_plain ADD COLUMNS (x INT)",
      "DESCRIBE TABLE prop_plain",
      "SHOW PARTITIONS prop_plain",
      "SHOW TABLES",
      "SET spark.sql.shuffle.partitions=4",
      "EXPLAIN SELECT 1",
      "-- a comment naming VACUUM graft.`p`\nSELECT 3",
      "SELECT /* OPTIMIZE graft.`x` ZORDER BY (a) */ 4")
    stmts.foreach { s =>
      assert(GraftSqlParser.matchVerb(spark, s).isEmpty,
        s"verb grammar wrongly claimed: $s")
      val parsed = delegate.parsePlan(s)
      val served = GraftSqlParser.serve(spark, parsed)
      assert(served eq parsed, s"not byte-identically delegated: $s")
    }
  }

  test("grammar edges: paths with spaces, 3-part session-catalog names, backticked columns") {
    // a table path containing a space works through every entry point
    val t0 = graft.Caches.newTempDir("gsql_sp").toString + "/with space/t"
    VersionedTable.commit(base, t0)
    GraftSql.run(spark, s"OPTIMIZE graft.`$t0`")
    assert(GraftSql.run(spark,
      s"SELECT count(*) AS n FROM graft.`$t0`").head().getLong(0) == 5L)
    GraftSql.run(spark,
      s"ALTER TABLE graft.`$t0` RENAME COLUMN `value` TO `amount`")
    assert(VersionedTable.read(spark, t0).columns.contains("amount"))
    // fully-qualified spark_catalog.db.table refs resolve like db.table
    val t1 = newTable("threepart")
    VersionedTable.commit(base, t1)
    spark.sql("DROP TABLE IF EXISTS gsql_tp_t")
    spark.sql(s"CREATE TABLE gsql_tp_t USING graft OPTIONS (path '$t1')")
    try {
      assert(GraftSql.run(spark,
        "DESCRIBE HISTORY spark_catalog.default.gsql_tp_t").count() == 1)
      GraftSql.run(spark,
        "DELETE FROM spark_catalog.default.gsql_tp_t WHERE id = 1")
      assert(VersionedTable.read(spark, t1).count() == 4)
      // a ref into a FOREIGN catalog is never ours — falls through to
      // Spark's own resolution error, not a graft message
      val e = intercept[Exception] {
        GraftSql.run(spark,
          "DESCRIBE HISTORY other_cat.default.gsql_tp_t")
      }
      assert(!e.getMessage.contains("no versioned table"))
    } finally spark.sql("DROP TABLE IF EXISTS gsql_tp_t")
  }

  // ── SQL DML (GraftDml: typed-plan claim of Spark's own grammar) ────

  test("INSERT INTO appends through the commit protocol; OVERWRITE replaces") {
    val t = newTable("ins")
    VersionedTable.commit(base, t)
    val v = GraftSql.run(spark,
      s"INSERT INTO graft.`$t` VALUES (6, 'thu', 60.0), (7, 'fri', 70.0)")
    assert(v.head().getInt(0) == 1, "INSERT must commit version 1")
    val df = VersionedTable.read(spark, t)
    assert(df.count() == 7)
    // the rows are REAL committed data: visible to reads, version-tagged
    assert(df.filter($"id" === 6L).head().getString(1) == "thu")
    assert(VersionedTable.read(spark, t, 0).count() == 5, "v0 intact")
    // column-list insert null-fills the unnamed column
    GraftSql.run(spark, s"INSERT INTO graft.`$t` (id, day) VALUES (8, 'sat')")
    val r8 = VersionedTable.read(spark, t).filter($"id" === 8L).head()
    assert(r8.getString(1) == "sat" && r8.isNullAt(2))
    // INSERT OVERWRITE replaces the snapshot (old versions retained)
    GraftSql.run(spark,
      s"INSERT OVERWRITE graft.`$t` VALUES (99, 'sun', 9.0)")
    assert(VersionedTable.read(spark, t).count() == 1)
    assert(VersionedTable.read(spark, t, 1).count() == 7)
  }

  test("INSERT INTO preserves the hive partition layout") {
    val t = newTable("inspart")
    VersionedTable.commit(base, t, Seq("day"))
    // positional INSERT follows the table's SELECT * order — the hive
    // partition column reads LAST (id, value, day); BY NAME / a column
    // list is order-free
    GraftSql.run(spark, s"INSERT INTO graft.`$t` VALUES (6, 60.0, 'mon')")
    GraftSql.run(spark,
      s"INSERT INTO graft.`$t` (id, day, value) VALUES (7, 'mon', 70.0)")
    val files = VersionedTable.read(spark, t).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/day=")),
      "SQL INSERT must not flatten a partitioned table's layout")
    assert(VersionedTable.read(spark, t)
      .filter($"day" === "mon").count() == 4)
  }

  test("INSERT by position arity-checks; wrong arity fails loud pre-commit") {
    val t = newTable("insbad")
    VersionedTable.commit(base, t)
    val e = intercept[Exception] {
      GraftSql.run(spark, s"INSERT INTO graft.`$t` VALUES (6, 'thu')")
    }
    assert(e.getMessage.contains("by position"), e.getMessage)
    assert(VersionedTable.versions(spark, t) == Seq(0),
      "a failed INSERT must not commit")
  }

  test("DELETE FROM WHERE rewrites only key-bearing files; bare DELETE is metadata-only truncate") {
    val t = newTable("del")
    VersionedTable.commit(base.repartition(3, $"id"), t)
    val pre = VersionedTable.read(spark, t).inputFiles.toSet
    val v = GraftSql.run(spark, s"DELETE FROM graft.`$t` WHERE id = 3")
    assert(v.head().getInt(0) == 1)
    val post = VersionedTable.read(spark, t)
    assert(post.count() == 4 && post.filter($"id" === 3L).count() == 0)
    // file-pruned: untouched files carried forward by reference
    assert(pre.intersect(VersionedTable.read(spark, t).inputFiles.toSet)
      .nonEmpty, "the delete must carry non-matching files forward")
    // alias-qualified predicate works too
    GraftSql.run(spark, s"DELETE FROM graft.`$t` AS x WHERE x.id = 1")
    assert(VersionedTable.read(spark, t).count() == 3)
    // bare DELETE: truncate without touching a byte of parquet
    val dataDirs = new java.io.File(s"$t/data").listFiles()
      .count(_.isDirectory)
    GraftSql.run(spark, s"DELETE FROM graft.`$t`")
    assert(VersionedTable.read(spark, t).count() == 0)
    assert(new java.io.File(s"$t/data").listFiles().count(_.isDirectory)
      == dataDirs, "bare DELETE must be a metadata-only commit")
    assert(VersionedTable.read(spark, t, 2).count() == 3,
      "pre-truncate snapshots keep the rows until vacuum")
  }

  test("UPDATE SET ... WHERE applies expressions to matching rows only") {
    val t = newTable("upd")
    VersionedTable.commit(base, t)
    val v = GraftSql.run(spark,
      s"UPDATE graft.`$t` SET value = value * 2 WHERE day = 'mon'")
    assert(v.head().getInt(0) == 1)
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
    assert(out.map(_.getDouble(2)).toSeq ==
      Seq(20.0, 40.0, 30.0, 40.0, 50.0))
    // multi-assignment + store-assignment cast (int literal into double)
    GraftSql.run(spark,
      s"UPDATE graft.`$t` SET value = 7, day = concat(day, '!') " +
        "WHERE id = 5")
    val r5 = VersionedTable.read(spark, t).filter($"id" === 5L).head()
    assert(r5.getString(1) == "wed!" && r5.getDouble(2) == 7.0)
    // unknown assignment column fails loud, nothing committed
    val pre = VersionedTable.versions(spark, t).max
    intercept[Exception] {
      GraftSql.run(spark, s"UPDATE graft.`$t` SET nope = 1")
    }
    assert(VersionedTable.versions(spark, t).max == pre)
  }

  test("MERGE INTO drives delete/update/insert clauses through one statement") {
    val t = newTable("merge")
    VersionedTable.commit(base, t)
    // patch: id1 (value 10 < 15 → DELETE), id3 (update to 99),
    // id9 (new → INSERT)
    Seq((1L, "mon", 99.0), (3L, "tue", 99.0), (9L, "sun", 90.0))
      .toDF("id", "day", "value").createOrReplaceTempView("gsql_merge_src")
    val v = GraftSql.run(spark,
      s"""MERGE INTO graft.`$t` AS t
         |USING gsql_merge_src AS s ON t.id = s.id
         |WHEN MATCHED AND t.value < 15 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET value = s.value + t.value
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(v.head().getInt(0) == 1)
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((2L, 20.0), (3L, 129.0), (4L, 40.0),
      (5L, 50.0), (9L, 90.0)))
  }

  test("MERGE with UPDATE SET * and a subquery source") {
    val t = newTable("mergestar")
    VersionedTable.commit(base, t)
    val v = GraftSql.run(spark,
      s"""MERGE INTO graft.`$t` AS t
         |USING (SELECT id, day, value * 10 AS value
         |       FROM graft.`$t` WHERE day = 'tue') AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(v.head().getInt(0) == 1)
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
    assert(out.map(_.getDouble(2)).toSeq ==
      Seq(10.0, 20.0, 300.0, 400.0, 50.0))
  }

  test("MERGE shapes the engine cannot honor fail loud, never silently") {
    val t = newTable("mergebad")
    VersionedTable.commit(base, t)
    base.limit(1).createOrReplaceTempView("gsql_mergebad_src")
    // non-equi ON
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.run(spark,
        s"""MERGE INTO graft.`$t` t USING gsql_mergebad_src s
           |ON t.id > s.id WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("same-column equality"))
    // a BY SOURCE clause referencing the source row is a statement bug
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.run(spark,
        s"""MERGE INTO graft.`$t` t USING gsql_mergebad_src s
           |ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND s.value > 5 THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("cannot reference the source"))
    assert(VersionedTable.versions(spark, t) == Seq(0))
  }

  test("MERGE clauses are ordered: first matching clause wins per row") {
    val t = newTable("mergeorder")
    VersionedTable.commit(base, t)
    // id1 and id3 both satisfy the UPDATE condition; id1 also satisfies
    // the later DELETE — but UPDATE is listed FIRST, so id1 is UPDATED,
    // never deleted. id5's source row satisfies only the DELETE.
    Seq((1L, "mon", 5.0), (3L, "tue", 5.0), (5L, "wed", 200.0))
      .toDF("id", "day", "value").createOrReplaceTempView("gsql_order_src")
    GraftSql.run(spark,
      s"""MERGE INTO graft.`$t` t USING gsql_order_src s ON t.id = s.id
         |WHEN MATCHED AND s.value < 10 THEN UPDATE SET value = s.value
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 5.0), (2L, 20.0), (3L, 5.0), (4L, 40.0)))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE drives the sync-a-snapshot idiom") {
    val t = newTable("mergesync")
    VersionedTable.commit(base, t)
    // snapshot source: keep 1 (updated), keep 3 (same), add 9; rows the
    // source lacks are deleted UNLESS they are 'wed' (condition guards
    // the by-source delete), which get flagged value = -1 instead
    Seq((1L, "mon", 11.0), (3L, "tue", 30.0), (9L, "sun", 90.0))
      .toDF("id", "day", "value").createOrReplaceTempView("gsql_sync_src")
    GraftSql.run(spark,
      s"""MERGE INTO graft.`$t` t USING gsql_sync_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.day = 'wed'
         |  THEN UPDATE SET value = -1
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    // 2 and 4 deleted (not in source); 5 is 'wed' → flagged
    assert(out.toSeq == Seq((1L, 11.0), (3L, 30.0), (5L, -1.0),
      (9L, 90.0)))
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table; without it a new source column fails loud") {
    val t = newTable("mergeevo")
    VersionedTable.commit(base, t)
    Seq((1L, "mon", 99.0, "x"), (9L, "sun", 90.0, "y"))
      .toDF("id", "day", "value", "tag")
      .createOrReplaceTempView("gsql_evo_src")
    // drifted source without the opt-in: loud, nothing committed
    val e = intercept[Exception] {
      GraftSql.run(spark,
        s"""MERGE INTO graft.`$t` t USING gsql_evo_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("evolveSchema"))
    assert(VersionedTable.versions(spark, t) == Seq(0))
    GraftSql.run(spark,
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$t` t
         |USING gsql_evo_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = VersionedTable.read(spark, t)
    assert(out.columns.contains("tag"))
    val byId = out.select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId(1L) == Some("x") && byId(9L) == Some("y") &&
      byId(2L).isEmpty, "updated/inserted rows take the new column, " +
        "untouched rows read null")
  }

  test("MERGE conditional column-list INSERT null-fills unlisted columns") {
    val t = newTable("mergeins")
    VersionedTable.commit(base, t)
    Seq((7L, "fri", 70.0), (8L, "sat", 3.0))
      .toDF("id", "day", "value").createOrReplaceTempView("gsql_ins_src")
    GraftSql.run(spark,
      s"""MERGE INTO graft.`$t` t USING gsql_ins_src s ON t.id = s.id
         |WHEN NOT MATCHED AND s.value > 10
         |  THEN INSERT (id, value) VALUES (s.id, s.value * 2)""".stripMargin)
    val out = VersionedTable.read(spark, t).orderBy("id").collect()
    // only id7 fired (s.value > 10); day not listed → null
    assert(out.length == 6)
    val r7 = out.last
    assert(r7.getLong(0) == 7L && r7.isNullAt(1) && r7.getDouble(2) == 140.0)
  }

  test("a graft write target in a NESTED position fails loud (write-position guard)") {
    // Hive-style multi-insert parses to a Union of InsertIntoStatement
    // nodes — a shape GraftDml.claim does NOT take (claim matches the
    // top-level node only). Without guardWrites the graft refs would
    // fall through to the read rewrite and Spark would plan raw parquet
    // writes into the snapshot relation's root, bypassing the commit
    // protocol. The guard must fail loud and commit NOTHING.
    val t = newTable("guard")
    VersionedTable.commit(base, t)
    Seq((10L, "fri", 1.0), (11L, "sat", 2.0)).toDF("id", "day", "value")
      .createOrReplaceTempView("gsql_guard_src")
    val e = intercept[IllegalArgumentException] {
      GraftSql.run(spark,
        s"""FROM gsql_guard_src
           |INSERT INTO graft.`$t` SELECT id, day, value
           |INSERT INTO graft.`$t` SELECT id + 100, day, value""".stripMargin)
    }
    assert(e.getMessage.contains("top-level statement"))
    assert(VersionedTable.versions(spark, t) == Seq(0))
    assert(VersionedTable.read(spark, t).count() == 5)
  }

  test("CLUSTERED BY declares bucketing; OPTIMIZE lays it; DETAIL reports it") {
    val t = newTable("bucket_sql")
    VersionedTable.commit(
      (1L to 200L).map(i => (i, s"d${i % 7}", i.toDouble))
        .toDF("id", "day", "value"), t)
    GraftSql.run(spark,
      s"ALTER TABLE graft.`$t` CLUSTERED BY (id) INTO 4 BUCKETS")
    assert(VersionedTable.bucketing(spark, t) == Some(("id", 4)))
    // the declaration takes effect on the next full-table write
    GraftSql.run(spark, s"OPTIMIZE graft.`$t`")
    val files = VersionedTable.read(spark, t).inputFiles
    assert(files.forall(f => org.apache.spark.sql.graft.SqlBridge
      .bucketIdOf(f.split("/").last).exists(_ < 4)),
      s"OPTIMIZE must lay the bucket files: ${files.mkString(",")}")
    val detail = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t`").head()
    assert(detail.getString(detail.fieldIndex("bucket_spec")) ==
      "id INTO 4 BUCKETS")
    assert(detail.getString(detail.fieldIndex("bucket_status")) ==
      "claimed", "DETAIL must report the laid-out claim")
    assert(GraftSql.run(spark,
      s"SELECT sum(id) AS s FROM graft.`$t`").head().getLong(0) ==
      (1L to 200L).sum)
    // a plain append degrades the claim — DETAIL names the version so
    // operators see the dropped layout without reading plans
    val vDeg = VersionedTable.append(
      Seq((999L, "d0", 1.0)).toDF("id", "day", "value"), t)
    val det2 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t`").head()
    assert(det2.getString(det2.fieldIndex("bucket_status")) ==
      s"degraded (since v$vDeg)", "DETAIL must name the degrade version")
    GraftSql.run(spark, s"OPTIMIZE graft.`$t`")
    val det3 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t`").head()
    assert(det3.getString(det3.fieldIndex("bucket_status")) == "claimed",
      "DETAIL must report the restored claim")
    // undeclared tables read null bucket columns
    val t2 = newTable("bucket_sql_plain")
    VersionedTable.commit(base, t2)
    val det4 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t2`").head()
    assert(det4.isNullAt(det4.fieldIndex("bucket_status")))
  }

  test("CTAS declares CLUSTERED BY and lands the layout in one statement") {
    val t = newTable("ctas_bucket")
    (1L to 400L).map(i => (i % 40, i, s"d${i % 3}", i.toDouble))
      .toDF("user_id", "event_id", "day", "value")
      .createOrReplaceTempView("ctas_bkt_src")
    spark.sql("DROP TABLE IF EXISTS ctas_bkt_t")
    try {
      GraftSql.run(spark,
        s"""CREATE TABLE ctas_bkt_t USING graft OPTIONS (path '$t')
           |PARTITIONED BY (day) CLUSTERED BY (user_id) INTO 4 BUCKETS
           |AS SELECT * FROM ctas_bkt_src""".stripMargin)
      assert(VersionedTable.bucketing(spark, t) == Some(("user_id", 4)))
      assert(VersionedTable.layoutPartitionCols(spark, t) == Seq("day"))
      // the CREATING commit itself laid the files: claimed, no OPTIMIZE
      assert(VersionedTable.bucketClaimStatus(spark, t) ==
        Some("claimed"),
        "the CTAS write must bucket-arrange and prove the layout")
      assert(GraftSql.run(spark,
        s"SELECT sum(event_id) AS s FROM graft.`$t`").head().getLong(0) ==
        (1L to 400L).sum)
      // CLUSTERED BY ... SORTED BY lands bucketed-sorted in the same
      // creating commit: claim AND sort proven, no OPTIMIZE
      val t3 = newTable("ctas_bucket_sorted")
      spark.sql("DROP TABLE IF EXISTS ctas_bkt_srt")
      try {
        GraftSql.run(spark,
          s"""CREATE TABLE ctas_bkt_srt USING graft OPTIONS (path '$t3')
             |CLUSTERED BY (user_id) SORTED BY (event_id) INTO 4 BUCKETS
             |AS SELECT * FROM ctas_bkt_src""".stripMargin)
        assert(VersionedTable.bucketDecl(spark, t3) ==
          Some(VersionedTable.BucketDecl(Seq("user_id"), 4,
            Seq("event_id"))))
        assert(VersionedTable.bucketClaimStatus(spark, t3) ==
          Some("claimed"))
        assert(VersionedTable.sortClaimStatus(spark, t3) ==
          Some("claimed"),
          "the CTAS write must lay and prove the declared sort")
      } finally spark.sql("DROP TABLE IF EXISTS ctas_bkt_srt")
    } finally spark.sql("DROP TABLE IF EXISTS ctas_bkt_t")
  }

  test("CLUSTERED BY (a, b) SORTED BY (c): multi-column + sorted SQL surface") {
    val t = newTable("bucket_sql_multi")
    VersionedTable.commit(
      (1L to 400L).map(i => (i % 10, s"k${i % 7}", i, i.toDouble))
        .toDF("user_id", "kind", "event_id", "value"), t)
    GraftSql.run(spark, s"ALTER TABLE graft.`$t` CLUSTERED BY " +
      "(user_id, kind) SORTED BY (event_id) INTO 8 BUCKETS")
    assert(VersionedTable.bucketDecl(spark, t) ==
      Some(VersionedTable.BucketDecl(Seq("user_id", "kind"), 8,
        Seq("event_id"))))
    GraftSql.run(spark, s"OPTIMIZE graft.`$t`")
    val detail = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t`").head()
    assert(detail.getString(detail.fieldIndex("bucket_spec")) ==
      "user_id,kind SORTED BY (event_id) INTO 8 BUCKETS")
    assert(detail.getString(detail.fieldIndex("bucket_status")) ==
      "claimed")
    assert(detail.getString(detail.fieldIndex("sort_status")) ==
      "claimed", "DETAIL must surface the sort claim")
    // a plain append degrades BOTH, visibly, version-named
    val vDeg = VersionedTable.append(
      Seq((3L, "k1", 9001L, 1.0))
        .toDF("user_id", "kind", "event_id", "value"), t)
    val det2 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t`").head()
    assert(det2.getString(det2.fieldIndex("sort_status")) ==
      s"degraded (since v$vDeg)")
    // tables without a SORTED BY declaration read a NULL sort_status
    val t2 = newTable("bucket_sql_nosort")
    VersionedTable.setBucketing(spark, t2, "id", 4)
    VersionedTable.commit(base, t2)
    val det3 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$t2`").head()
    assert(det3.isNullAt(det3.fieldIndex("sort_status")),
      "no SORTED BY -> null sort_status")
    assert(det3.getString(det3.fieldIndex("bucket_status")) == "claimed")
  }

  test("DML works on catalog-name refs (USING graft tables)") {
    val t = newTable("dmlcat")
    VersionedTable.commit(base, t)
    spark.sql("DROP TABLE IF EXISTS gsql_dml_t")
    spark.sql(s"CREATE TABLE gsql_dml_t USING graft OPTIONS (path '$t')")
    try {
      GraftSql.run(spark, "INSERT INTO gsql_dml_t VALUES (6, 'thu', 60.0)")
      GraftSql.run(spark, "DELETE FROM gsql_dml_t WHERE id = 1")
      GraftSql.run(spark,
        "UPDATE gsql_dml_t SET value = 0 WHERE day = 'tue'")
      val out = spark.sql("SELECT id, value FROM gsql_dml_t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(out.toSeq == Seq((2L, 20.0), (3L, 0.0), (4L, 0.0),
        (5L, 50.0), (6L, 60.0)))
    } finally spark.sql("DROP TABLE IF EXISTS gsql_dml_t")
  }

  test("the extension session runs DML via plain spark.sql; reads see commits") {
    val t = newTable("dmlext")
    VersionedTable.commit(base, t)
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
    s2.sql(s"INSERT INTO graft.`$t` VALUES (6, 'thu', 60.0)")
    s2.sql(s"DELETE FROM graft.`$t` WHERE id <= 2")
    assert(s2.sql(s"SELECT count(*) AS n FROM graft.`$t`")
      .head().getLong(0) == 4L)
    assert(VersionedTable.read(spark, t).count() == 4)
    // the CDC TVF works through the injected parser too
    assert(s2.sql(
      s"SELECT count(*) AS n FROM table_changes('$t', 1, 2)")
      .head().getLong(0) > 0)
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
