package graft.catalog

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.catalog.MaterializedView.AggDef

/** Automatic aggregate rewrite onto materialized views ([[MvRewrite]]):
  * the substitution fires only behind every gate (registered, snapshot-
  * exact fresh, exactness-preserving aggregates, group-column-only
  * filters), compensates rollups correctly (incl. NULL algebra and
  * global rollups), and declines — never breaks — everything else.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newDir(tag: String): String =
    graft.Caches.newTempDir(s"mvrw_$tag").toString

  // nulls in v for the NULL-algebra cases: group c is all-null
  private def base: DataFrame = Seq(
    (1L, "a", "x", Some(10L)), (2L, "a", "y", Some(20L)),
    (3L, "b", "x", Some(30L)), (4L, "b", "y", None),
    (5L, "c", "x", None)
  ).toDF("id", "grp", "sub", "v")

  /** A (source, view) pair with the view registered for rewrite. */
  private def fixture(tag: String,
                      aggs: Seq[AggDef] = Seq(AggDef("count", "*", "n"),
                        AggDef("sum", "v", "sv"), AggDef("min", "v", "mn"),
                        AggDef("max", "v", "mx"))): (String, String) = {
    val dir = newDir(tag)
    val src = s"$dir/src"; val view = s"$dir/view"
    VersionedTable.commit(base, src)
    MaterializedView.create(spark, src, view, Seq("grp", "sub"), aggs)
    MaterializedView.enableRewrite(spark, view)
    (src, view)
  }

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def servedByView(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("/view") && !p.contains("/src")
  }

  test("subset rollup with filter serves from the view, values equal the direct plan") {
    val (src, view) = fixture("rollup")
    def q(path: String): DataFrame = GraftScan.read(spark, path)
      .filter(col("grp") =!= "c")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        sum("v").as("s"), min("v").as("mn"), max("v").as("mx"),
        avg("v").as("av"))
      .orderBy("grp")
    val served = q(src)
    assert(servedByView(served), planOf(served))
    // the expected CLOSED FORM, not a comparison against the direct
    // plan alone — guards against both plans agreeing on a wrong answer
    val rows = served.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
      Option(r.get(4)).map(_.asInstanceOf[Long]),
      Option(r.get(5)).map(_.asInstanceOf[Long]),
      Option(r.get(6)).map(_.asInstanceOf[Double]))).toSeq
    assert(rows == Seq(
      ("a", 2L, 2L, Some(30L), Some(10L), Some(20L), Some(15.0)),
      ("b", 2L, 1L, Some(30L), Some(30L), Some(30L), Some(30.0))))
  }

  test("exact-group match (all group cols) also serves from the view") {
    val (_, view) = fixture("exact")
    val src = MaterializedView.sourcePath(spark, view)
    val served = GraftScan.read(spark, src)
      .groupBy("grp", "sub").agg(sum("v").as("s")).orderBy("grp", "sub")
    assert(servedByView(served), planOf(served))
    // direct reference over the local frame (a LocalRelation — never a
    // rewrite candidate)
    val direct = base.groupBy("grp", "sub").agg(sum("v").as("s"))
      .orderBy("grp", "sub")
    assert(served.collect().toSeq == direct.collect().toSeq)
  }

  test("global rollup (no group-by) compensates; count is 0, not null, on an empty match") {
    val (src, view) = fixture("global")
    val g = GraftScan.read(spark, src)
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(servedByView(g), planOf(g))
    val r = g.collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 60L)
    // empty after a group-col filter: count must read 0 (Coalesce), sum null
    val e = GraftScan.read(spark, src).filter(col("grp") === "zzz")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(servedByView(e), planOf(e))
    val er = e.collect().head
    assert(er.getLong(0) == 0L && er.isNullAt(1))
  }

  test("NULL algebra: an all-null group's sum/min/avg stay null through compensation") {
    val (src, view) = fixture("nulls")
    val served = GraftScan.read(spark, src).filter(col("grp") === "c")
      .groupBy("grp")
      .agg(sum("v").as("s"), min("v").as("mn"), avg("v").as("av"),
        count(col("v")).as("nv"))
    assert(servedByView(served), planOf(served))
    val r = served.collect().head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) &&
      r.getLong(4) == 0L)
  }

  test("staleness gate: un-refreshed append falls back; refresh restores the rewrite") {
    val (src, view) = fixture("stale")
    def q(): DataFrame = GraftScan.read(spark, src)
      .groupBy("grp").agg(sum("v").as("s")).orderBy("grp")
    assert(servedByView(q()))
    VersionedTable.append(Seq((9L, "a", "x", Some(5L)))
      .toDF("id", "grp", "sub", "v"), src)
    def sums(df: DataFrame): Seq[(String, Option[Long])] =
      df.collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
    val stale = q()
    val p = planOf(stale)
    assert(p.contains("/src") && !p.contains("/view"), p)
    assert(sums(stale)
      == Seq(("a", Some(35L)), ("b", Some(30L)), ("c", None)))
    MaterializedView.refresh(spark, view)
    val back = q()
    assert(servedByView(back), planOf(back))
    assert(sums(back)
      == Seq(("a", Some(35L)), ("b", Some(30L)), ("c", None)))
  }

  test("time travel AHEAD-of-view: a pinned old snapshot never serves from a newer view") {
    val (src, view) = fixture("travel")
    VersionedTable.append(Seq((9L, "a", "x", Some(5L)))
      .toDF("id", "grp", "sub", "v"), src)
    MaterializedView.refresh(spark, view) // view now reflects v1
    val old = GraftScan.read(spark, src, version = 0)
      .groupBy("grp").agg(sum("v").as("s")).orderBy("grp")
    val p = planOf(old)
    assert(p.contains("/src") && !p.contains("/view"), p)
    assert(old.collect().map(r => (r.getString(0),
      Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
      == Seq(("a", Some(30L)), ("b", Some(30L)), ("c", None)))
    // while the HEAD query serves from the view
    assert(servedByView(GraftScan.read(spark, src)
      .groupBy("grp").agg(sum("v").as("s"))))
  }

  test("declines: non-group filter, non-group agg column, distinct, unsupported fn, expression key") {
    val (src, view) = fixture("decline",
      aggs = Seq(AggDef("count", "*", "n"), AggDef("sum", "v", "sv"),
        AggDef("approx_count_distinct", "sub", "du")))
    def base(path: String) = GraftScan.read(spark, path)
    def falls(df: DataFrame): Unit = {
      val p = planOf(df)
      assert(p.contains("/src") && !p.contains("/view"), p)
    }
    falls(base(src).filter(col("v") > 0)
      .groupBy("grp").agg(sum("v").as("s")))              // data filter
    falls(base(src).groupBy("grp").agg(sum("id").as("s"))) // un-stored col
    falls(base(src).groupBy("grp").agg(countDistinct("v").as("s")))
    falls(base(src).groupBy("grp")
      .agg(approx_count_distinct("sub").as("s")))          // sketch fn
    falls(base(src).groupBy((col("grp") === "a").as("g"))
      .agg(sum("v").as("s")))                              // expr key
    // and min is not served by a view lacking a min def
    falls(base(src).groupBy("grp").agg(min("v").as("s")))
  }

  test("DISTINCT over view grouping columns is exactly served; over a value column it declines") {
    val (src, view) = fixture("distinct")
    // count(distinct sub) per grp: the (grp, sub) view holds each live
    // tuple once — the distinct sets are identical
    val served = GraftScan.read(spark, src)
      .groupBy("grp")
      .agg(countDistinct("sub").as("ds"), count(lit(1)).as("n"))
      .orderBy("grp")
    assert(servedByView(served), planOf(served))
    assert(served.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 2L, 2L), ("b", 2L, 2L), ("c", 1L, 1L)))
    // global distinct rollup too
    val g = GraftScan.read(spark, src).agg(countDistinct("sub").as("ds"))
    assert(servedByView(g), planOf(g))
    assert(g.collect().head.getLong(0) == 2L)
    // DISTINCT over a NON-group (value) column must keep the base plan
    val p = planOf(GraftScan.read(spark, src)
      .groupBy("grp").agg(countDistinct("v").as("dv")))
    assert(p.contains("/src") && !p.contains("/view"), p)
  }

  test("HAVING composes (the filter above the aggregate resolves against the preserved exprIds)") {
    val (src, view) = fixture("having")
    val served = GraftScan.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .filter(col("n") > 1).orderBy("grp")
    assert(servedByView(served), planOf(served))
    assert(served.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq
      == Seq(("a", 2L, Some(30L)), ("b", 2L, Some(30L))))
  }

  test("count over a null constant answers 0, never the group row count") {
    // Spark's optimizer usually folds count(null) to literal 0 before
    // the rewrite runs (the folded group-only aggregate may then serve
    // from the view — correct: the view holds exactly the live
    // groups); the compensation-level guard covers sessions where the
    // fold has not run yet. Either way the VALUE must be 0.
    val (src, _) = fixture("cnull")
    val q = GraftScan.read(spark, src).groupBy("grp")
      .agg(count(lit(null)).as("zeros")).orderBy("grp")
    val rows = q.collect()
    assert(rows.length == 3 && rows.forall(_.getLong(1) == 0L),
      rows.mkString(","))
  }

  test("a PARTITIONED view serves with hive partition pruning in the rewritten plan") {
    val dir = newDir("part")
    val src = s"$dir/src"; val view = s"$dir/view"
    VersionedTable.commit(base, src)
    MaterializedView.create(spark, src, view, Seq("grp", "sub"),
      Seq(AggDef("sum", "v", "sv")), partitionCols = Seq("grp"))
    MaterializedView.enableRewrite(spark, view)
    val served = GraftScan.read(spark, src).filter(col("grp") === "a")
      .groupBy("grp").agg(sum("v").as("s"))
    val p = planOf(served)
    assert(p.contains("/view") && !p.contains("/src"), p)
    // the rebound group-column filter prunes the view's OWN layout —
    // serving cost is O(touched view partitions), not O(view)
    assert("PartitionFilters: \\[[^\\]]*grp".r.findFirstIn(p).isDefined, p)
    assert(served.collect().map(r => (r.getString(0),
      Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
      == Seq(("a", Some(30L))))
  }

  test("disableRewrite withdraws the view; other queries never regress") {
    val (src, view) = fixture("disable")
    assert(servedByView(GraftScan.read(spark, src)
      .groupBy("grp").agg(sum("v").as("s"))))
    MaterializedView.disableRewrite(spark, view)
    val p = planOf(GraftScan.read(spark, src)
      .groupBy("grp").agg(sum("v").as("s")))
    assert(p.contains("/src") && !p.contains("/view"), p)
  }

  test("SQL surface: CREATE MV + ALTER ... ENABLE REWRITE serves a SQL rollup; DISABLE withdraws") {
    import graft.sql.GraftSql
    val dir = newDir("sql")
    val src = s"$dir/src"; val view = s"$dir/view"
    VersionedTable.commit(base, src)
    GraftSql.run(spark,
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT grp, sum(v) AS sv FROM graft.`$src` GROUP BY grp"""
        .stripMargin)
    GraftSql.run(spark,
      s"ALTER MATERIALIZED VIEW graft.`$view` ENABLE REWRITE")
    val served = GraftSql.run(spark,
      s"SELECT grp, sum(v) AS s FROM graft.`$src` GROUP BY grp ORDER BY grp")
    val p = planOf(served)
    assert(p.contains("/view") && !p.contains("/src"), p)
    assert(served.collect().map(r => (r.getString(0),
      Option(r.get(1)).map(_.asInstanceOf[Long]))).toSeq
      == Seq(("a", Some(30L)), ("b", Some(30L)), ("c", None)))
    // DESCRIBE DETAIL surfaces the enablement on the view
    val det = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$view`").head()
    assert(det.getBoolean(det.fieldIndex("mv_rewrite_enabled")))
    GraftSql.run(spark,
      s"ALTER MATERIALIZED VIEW graft.`$view` DISABLE REWRITE")
    val p2 = planOf(GraftSql.run(spark,
      s"SELECT grp, sum(v) AS s FROM graft.`$src` GROUP BY grp"))
    assert(p2.contains("/src") && !p2.contains("/view"), p2)
    val det2 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$view`").head()
    assert(!det2.getBoolean(det2.fieldIndex("mv_rewrite_enabled")))
    // and an ordinary (non-view) table reads null
    val det3 = GraftSql.run(spark, s"DESCRIBE DETAIL graft.`$src`").head()
    assert(det3.isNullAt(det3.fieldIndex("mv_rewrite_enabled")))
  }

  test("a view defined WITH its own WHERE never substitutes") {
    val dir = newDir("where")
    val src = s"$dir/src"; val view = s"$dir/view"
    VersionedTable.commit(base, src)
    MaterializedView.create(spark, src, view, Seq("grp"),
      Seq(AggDef("sum", "v", "sv")), where = Some("sub = 'x'"))
    MaterializedView.enableRewrite(spark, view)
    val p = planOf(GraftScan.read(spark, src)
      .groupBy("grp").agg(sum("v").as("s")))
    assert(p.contains("/src") && !p.contains("/view"), p)
  }
}
