package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Seeded property sweep for the change-consumer walk: random commit
  * histories mixing appends, predicate deletes, DV deletes, updates,
  * OPTIMIZE and small-file compaction — then, over random windows,
  *
  *  1. the per-version feed REPLAYS: state(since) + inserts − deletes
  *     must equal state(to) as multisets, with maintenance versions
  *     contributing nothing;
  *  2. whenever `changeRemovals` reports an append-only window (zero —
  *     including windows whose only rewrites are maintenance),
  *     `changes()` must deliver exactly the window's new rows.
  *
  * The row-level oracle is an in-memory multiset model maintained
  * beside the table — the walk's equivalence threading can't drift
  * from it without failing here.
  */
class ChangeWalkSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type RowT = (Long, Long)

  test("random histories: feed replays exactly; clean windows deliver only new rows") {
    for (seed <- Seq(11, 47)) {
      val rng = new scala.util.Random(seed)
      val t = graft.Caches.newTempDir(s"walk_sweep_$seed").toString + "/t"
      var nextId = 0L
      def fresh(k: Int): Seq[RowT] = {
        val rs = (0 until k).map(i => (nextId + i, (nextId + i) * 10))
        nextId += k
        rs
      }
      // state(v) = the table's row multiset at version v
      val states = scala.collection.mutable.ArrayBuffer.empty[Set[RowT]]
      def commitState(rows: Set[RowT]): Unit = {
        val head = VersionedTable.versions(spark, t).max
        // maintenance verbs may skip committing (nothing to fold):
        // record one state per ACTUAL version
        while (states.size <= head) states += rows
      }
      VersionedTable.commit(fresh(6).toDF("id", "v")
        .repartition(2, col("id")), t)
      states += VersionedTable.read(spark, t).as[(Long, Long)]
        .collect().toSet
      (1 to 12).foreach { _ =>
        val cur = states.last
        rng.nextInt(6) match {
          case 0 | 1 =>
            val rows = fresh(1 + rng.nextInt(3))
            VersionedTable.append(rows.toDF("id", "v"), t)
            commitState(cur ++ rows)
          case 2 =>
            if (cur.nonEmpty) {
              val victim = cur.toSeq(rng.nextInt(cur.size))._1
              VersionedTable.deleteWhere(spark, t,
                Some(s"id = $victim"), dv = rng.nextBoolean())
              commitState(cur.filterNot(_._1 == victim))
            }
          case 3 =>
            if (cur.nonEmpty) {
              val victim = cur.toSeq(rng.nextInt(cur.size))._1
              VersionedTable.updateWhere(spark, t,
                Seq("v" -> "v + 1"), Some(s"id = $victim"),
                dv = rng.nextBoolean())
              commitState(cur.map { case (i, v) =>
                if (i == victim) (i, v + 1) else (i, v) })
            }
          case 4 =>
            VersionedTable.optimize(spark, t)
            commitState(cur)
          case 5 =>
            VersionedTable.compactSmallFiles(spark, t,
              targetFileBytes = 1024L * 1024)
            commitState(cur)
        }
      }
      val head = VersionedTable.versions(spark, t).max
      assert(states.size == head + 1,
        s"model drifted from the version ladder: ${states.size} vs $head")
      // random windows: replay + clean-window delivery
      (1 to 8).foreach { _ =>
        val since = rng.nextInt(head)
        val to = since + 1 + rng.nextInt(head - since)
        val feed = VersionedTable.changeFeed(spark, t, since + 1, to)
          .select("id", "v", "_change_type", "_commit_version").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getInt(3)))
        // replay IN COMMIT ORDER, deletes before inserts within a
        // version (a file rewrite emits both for its surviving rows)
        val replayed = feed.groupBy(_._4).toSeq.sortBy(_._1)
          .foldLeft(states(since)) { case (st, (_, evs)) =>
            val dels = evs.filter(_._3 == "delete").map(e => (e._1, e._2))
            val inss = evs.filter(_._3 == "insert").map(e => (e._1, e._2))
            dels.foreach(d => assert(st(d),
              s"[$seed] delete of absent row $d in window ($since,$to]"))
            st -- dels ++ inss
          }
        if (replayed != states(to)) {
          VersionedTable.history(spark, t).orderBy("version").collect()
            .foreach(r => System.err.println(s"[sweep] $r"))
          feed.sortBy(f => (f._4, f._1)).foreach(f =>
            System.err.println(s"[sweep] feed $f"))
          System.err.println(s"[sweep] state($since)=${states(since).toSeq.sorted}")
          System.err.println(s"[sweep] state($to)=${states(to).toSeq.sorted}")
        }
        assert(replayed == states(to),
          s"[$seed] feed replay diverged on window ($since,$to]")
        if (VersionedTable.changeRemovals(spark, t, since, to) == 0) {
          val ch = VersionedTable.changes(spark, t, since, to)
          val delivered =
            if (ch.columns.isEmpty) Set.empty[RowT]
            else ch.select("id", "v").as[(Long, Long)].collect().toSet
          assert(delivered == states(to) -- states(since),
            s"[$seed] clean window ($since,$to] delivered $delivered " +
              s"but the new rows are ${states(to) -- states(since)}")
        }
      }
    }
  }
}
