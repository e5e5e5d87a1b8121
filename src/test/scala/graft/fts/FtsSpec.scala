package graft.fts

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FtsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "Spark SQL engine", "the catalyst optimizer rewrites plans"),
    (2L, "DuckDB", "an embedded analytical engine"),
    (3L, "Spark streaming", "micro batch engine with watermarks catalyst")
  ).toDF("doc_id", "title", "body")

  lazy val index = Fts.buildIndex(docs, "doc_id", Seq("title", "body"))

  test("index has tf per (term, doc)") {
    val rows = index.collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) -> r.getAs[Long]("tf"))
      .toMap
    assert(rows(("engine", 1L)) == 1L)
    assert(rows(("catalyst", 3L)) == 1L)
    assert(rows.contains(("spark", 1L)) && rows.contains(("spark", 3L)))
  }

  test("single-term search") {
    val hits = Fts.search(index, "Catalyst").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 3L))
  }

  test("AND search requires all terms and ranks by tf-idf") {
    val res = Fts.searchAll(index, Seq("spark", "catalyst"), nDocs = 3).collect()
    assert(res.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
    val none = Fts.searchAll(index, Seq("spark", "duckdb"), nDocs = 3).collect()
    assert(none.isEmpty)
  }

  test("contains parity path") {
    val hits = Fts.matchContains(docs, "body", "ENGINE")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(2L, 3L))
  }

  test("index over the real documents table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val idx = Fts.buildIndex(real, "doc_id", Seq("text"))
    val n = real.count()
    val top = Fts.searchAll(idx, Seq("spark"), n)
    assert(top.count() > 0)
  }

  test("bucketed index: term lookup prunes to one bucket, no shuffle on df agg") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Fts.writeIndex(Fts.buildIndex(real, "doc_id", Seq("text")), "t_fts_idx",
      numBuckets = 8)
    try {
      // autoBucketedScan drops the bucketed layout for scans it thinks
      // don't need it, which also forfeits bucket pruning — pin it on so
      // the equality lookup can prune
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val table = spark.table("t_fts_idx")
      // equality on the bucket column prunes the scan to 1 of 8 buckets
      val lookup = Fts.search(table, "spark")
      val scan = lookup.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"), scan)
      assert(lookup.count() ==
        Fts.search(spark.table("t_fts_idx"), "spark").count())
      // per-term df aggregation reuses the write-time partitioning
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dfPlan = Fts.docFreq(table).queryExecution.executedPlan.toString
      assert(!dfPlan.contains("Exchange"), dfPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS t_fts_idx")
    }
  }
}
