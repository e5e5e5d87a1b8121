package graft.catalog

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Identity columns: block-reserved distributed minting — unique across
  * writers with one create-exclusive cursor file per commit, gaps
  * allowed (never duplicates), supplied values respected, SQL INSERT
  * integration, merge null-fill guard, clones carry the cursor.
  */
class IdentityColumnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newTable(): String =
    graft.Caches.newTempDir("ident_spec").toString + "/t"

  private def rids(t: String): Seq[Long] =
    VersionedTable.read(spark, t).select("rid").collect()
      .map(_.getLong(0)).toSeq

  test("minting: unique, block-monotonic, gaps on crash, explicit values kept") {
    val t = newTable()
    VersionedTable.setIdentityColumn(spark, t, "rid")
    VersionedTable.commit(
      Seq(("mon", 10.0), ("tue", 20.0)).toDF("day", "value"), t)   // v0
    assert(rids(t).sorted == Seq(1L, 2L))
    VersionedTable.append(
      Seq(("wed", 30.0), ("thu", 40.0), ("fri", 50.0))
        .toDF("day", "value"), t)                                  // v1
    val afterAppend = rids(t)
    assert(afterAppend.distinct.size == 5)
    assert(afterAppend.sorted == Seq(1L, 2L, 3L, 4L, 5L))
    // a crashed writer's reservation is a GAP, never a duplicate:
    // plant a higher cursor as if a writer died post-claim pre-commit
    new java.io.File(s"$t/_commits/_idhw").mkdirs()
    new java.io.File(s"$t/_commits/_idhw/rid-50").createNewFile()
    VersionedTable.append(Seq(("sat", 60.0)).toDF("day", "value"), t)
    val all = rids(t)
    assert(all.distinct.size == 6)
    assert(all.max == 51L, s"the next block must start past the gap: $all")
    // a batch SUPPLYING the column keeps its values (rewrites do too)
    VersionedTable.append(
      Seq(("sun", 70.0, 1000L)).toDF("day", "value", "rid"), t)
    assert(rids(t).contains(1000L))
    assert(rids(t).distinct.size == 7)
    // a rewrite verb carries ids untouched
    VersionedTable.updateWhere(spark, t,
      Seq("value" -> "value + 1"), Some("day = 'mon'"))
    assert(rids(t).sorted == all.sorted :+ 1000L)
  }

  test("start/step respected; declaration surfaces; SQL INSERT mints") {
    val t = newTable()
    VersionedTable.setIdentityColumn(spark, t, "rid",
      start = 1000L, step = 10L)
    assert(VersionedTable.identityColumns(spark, t) ==
      Map("rid" -> ((1000L, 10L))))
    VersionedTable.commit(
      Seq(("a", 1.0), ("b", 2.0)).toDF("day", "value"), t)
    assert(rids(t).sorted == Seq(1000L, 1010L))
    // positional SQL INSERT skips the identity column (minted)
    graft.sql.GraftSql.run(spark,
      s"INSERT INTO graft.`$t` VALUES ('c', 3.0)")
    assert(rids(t).sorted == Seq(1000L, 1010L, 1020L))
    // column-list INSERT leaves it absent too (never null-filled)
    graft.sql.GraftSql.run(spark,
      s"INSERT INTO graft.`$t` (day, value) VALUES ('d', 4.0)")
    assert(rids(t).distinct.size == 4)
    assert(!rids(t).contains(null))
    // an explicit column-list value is kept
    graft.sql.GraftSql.run(spark,
      s"INSERT INTO graft.`$t` (day, value, rid) VALUES ('e', 5.0, 9999)")
    assert(rids(t).contains(9999L))
  }

  test("racing writers never mint a duplicate") {
    val t = newTable()
    VersionedTable.setIdentityColumn(spark, t, "rid")
    VersionedTable.commit(Seq(("seed", 0.0)).toDF("day", "value"), t)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try VersionedTable.append(
          Seq((s"w$i-a", i.toDouble), (s"w$i-b", i + 0.5))
            .toDF("day", "value"), t): Unit
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing appends failed: ${errs.peek()}")
    val all = rids(t)
    assert(all.size == 9 && all.distinct.size == 9,
      s"racing writers minted duplicates: ${all.sorted}")
  }

  test("minting stays in codegen: no RDD scan, assignment in batch order") {
    val t = newTable()
    VersionedTable.setIdentityColumn(spark, t, "rid", start = 10L, step = 3L)
    val fsys = VersionedTable.fs(spark, t)
    val batch = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "v")
      .repartition(7)
    val filled = VersionedTable.fillOneIdentity(batch, fsys, t,
      "rid", 10L, 3L)
    // the assignment is a plain expression over the staged batch — an
    // RDD round-trip (the old zipWithIndex shape) would exit whole-
    // stage codegen for every identity-table ingest
    val rddScans = filled.queryExecution.executedPlan.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }
    assert(rddScans.isEmpty,
      s"identity fill must not round-trip through an RDD: $rddScans")
    val got = filled.select("rid").collect().map(_.getLong(0)).toSeq
    assert(got.size == 1000 && got.distinct.size == 1000)
    // exactly the contract: start + k*step over a contiguous block
    assert(got.sorted == (0L until 1000L).map(k => 10L + k * 3L),
      s"block must be contiguous in start+k*step: ${got.sorted.take(5)}...")
    graft.Caches.release()
  }

  test("supplied values advance the cursor: later minting never re-issues them") {
    val t = newTable()
    VersionedTable.setIdentityColumn(spark, t, "rid")
    VersionedTable.commit(
      Seq(("mon", 10.0), ("tue", 20.0)).toDF("day", "value"), t)  // rids 1,2
    // a batch SUPPLYING values in the NOT-YET-CLAIMED range: the SYNC
    // IDENTITY step must advance the cursor past them, or the next
    // minting append would duplicate 5 and 7
    VersionedTable.append(
      Seq(("wed", 30.0, 5L), ("thu", 40.0, 7L))
        .toDF("day", "value", "rid"), t)
    VersionedTable.append(
      Seq(("fri", 50.0), ("sat", 60.0), ("sun", 70.0))
        .toDF("day", "value"), t)
    val all = rids(t)
    assert(all.distinct.size == 7,
      s"a supplied in-range value was minted again: ${all.sorted}")
    assert(all.filter(_ > 7L).size == 3,
      s"minting must resume past the supplied max: ${all.sorted}")
    // non-unit step: supplied off-grid and on-grid values both sync
    val t2 = newTable()
    VersionedTable.setIdentityColumn(spark, t2, "rid",
      start = 100L, step = 10L)
    VersionedTable.commit(
      Seq(("a", 1.0, 170L), ("b", 2.0, 175L))
        .toDF("day", "value", "rid"), t2)
    VersionedTable.append(Seq(("c", 3.0)).toDF("day", "value"), t2)
    val all2 = rids(t2)
    assert(all2.distinct.size == 3 && all2.max > 175L,
      s"step-10 sync must mint past the supplied range: ${all2.sorted}")
  }

  test("MERGE refuses to null-fill an identity column; clones carry the cursor") {
    val t = newTable()
    VersionedTable.setIdentityColumn(spark, t, "rid")
    VersionedTable.commit(
      Seq(("mon", 10.0), ("tue", 20.0)).toDF("day", "value"), t)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.mergeWhen(
        Seq(("wed", 30.0)).toDF("day", "value"), t, "day")
    }
    assert(e.getMessage.contains("IDENTITY"))
    // matched-only merges (no insert clause) are fine
    VersionedTable.mergeWhen(
      Seq(("mon", 11.0)).toDF("day", "value"), t, "day", insert = false)
    assert(rids(t).sorted == Seq(1L, 2L))
    // a clone's first minting append must not duplicate cloned ids
    val c = newTable()
    VersionedTable.cloneTable(spark, t, c)
    VersionedTable.append(Seq(("wed", 30.0)).toDF("day", "value"), c)
    val cloneIds = rids(c)
    assert(cloneIds.distinct.size == 3)
    assert(cloneIds.max > 2L,
      s"the clone restarted its cursor and duplicated ids: $cloneIds")
    // and the source stays independent
    VersionedTable.append(Seq(("thu", 40.0)).toDF("day", "value"), t)
    assert(rids(t).distinct.size == 3)
  }
}
