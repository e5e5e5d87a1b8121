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

  test("sorted index: prefix predicate pushes down, results match unsorted") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = Fts.buildIndex(docs, "doc_id", Seq("text"))
    val dir = graft.Caches.newTempDir("graft_fts_sorted").toString
    Fts.writeIndexSorted(idx, dir, numFiles = 4)

    val fromSorted = Fts.searchPrefix(spark.read.parquet(dir), "wind")
    fromSorted.collect() // finalize AQE stages before digging for the scan
    import graft.PlanDig.scansOf
    // the prefix filter reaches the parquet reader (row-group stats can
    // then skip non-overlapping term ranges in the sorted layout)
    val scan = scansOf(fromSorted.queryExecution.executedPlan).head
    assert(scan.toString.contains("StartsWith(term,wind)") ||
      scan.metadata.get("PushedFilters").exists(_.contains("StringStartsWith(term,wind)")),
      scan.toString)

    val a = fromSorted.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSet
    val b = Fts.searchPrefix(idx, "wind").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("OR query: any-term membership, AND results are a subset") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark window functions"),
      (2L, "spark only here"),
      (3L, "window only here"),
      (4L, "neither term")).toDF("doc_id", "text")
    val idx = Fts.buildIndex(docs, "doc_id", Seq("text"))
    val or = Fts.searchAnyFrom(idx, docs, Seq("spark", "window"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_terms")).toMap
    assert(or.keySet == Set(1L, 2L, 3L))
    assert(or(1L) == 2 && or(2L) == 1 && or(3L) == 1)
    val and = Fts.searchAllFrom(idx, docs, Seq("spark", "window"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(and == Set(1L) && and.subsetOf(or.keySet))
  }

  test("prefix query: expansion OR'd, scored by total tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "window windows windowing"),
      (2L, "window pane"),
      (3L, "wind and rain"),
      (4L, "nothing matches")).toDF("doc_id", "text")
    val idx = Fts.buildIndex(docs, "doc_id", Seq("text"))
    val got = Fts.searchPrefix(idx, "wind").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("score")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((3L, 3L)))  // three distinct wind* terms
    assert(got(2L) == ((1L, 1L)))
    assert(got(3L) == ((1L, 1L)))  // 'wind' itself matches 'wind*'
  }

  test("bm25: hand-checked score, length normalization favors shorter doc") {
    // two docs, both contain 'cat' once; doc 2 is 3x longer -> lower score
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat dog dog dog dog dog"),
      (3L, "bird only here")).toDF("doc_id", "text")
    val idx = Fts.buildIndex(docs, "doc_id", Seq("text"))
    val got = Fts.searchBm25From(idx, docs, Seq("cat")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got.keySet == Set(1L, 2L))
    // closed form: N=3, df=2 -> idf = ln(1 + 1.5/2.5); avgdl = (2+6+3)/3
    val idf = math.log(1.0 + 1.5 / 2.5)
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (11.0 / 3)))
    assert(math.abs(got(1L) - s(1, 2)) < 1e-12, s"got ${got(1L)}")
    assert(math.abs(got(2L) - s(1, 6)) < 1e-12)
    assert(got(1L) > got(2L), "same tf, longer doc ranks lower")
  }

  test("similarDocs: clone ranks first at cosine 1, stopword-heavy doc excluded by maxDf") {
    val docs = Seq(
      (0L, "spark shuffle partition broadcast join"),
      (1L, "spark shuffle partition broadcast join"),   // clone of the query doc
      (2L, "spark shuffle window"),                     // partial overlap
      (3L, "totally unrelated words entirely elsewhere")
    ).toDF("doc_id", "text")
    val idx = Fts.buildIndex(docs, "doc_id", Seq("text"))
    val got = Fts.similarDocs(idx, docs, queryDocId = 0L, k = 10, maxDf = 0.9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.head._1 == 1L && math.abs(got.head._2 - 1.0) < 1e-12,
      s"clone first at cosine 1.0: ${got.toSeq}")
    assert(got.map(_._1).toSet == Set(1L, 2L), "no-shared-term doc never a candidate")
    // 'spark' and 'shuffle' are each in 3 of 4 docs (df 0.75): maxDf 0.5
    // drops both from scoring, and doc 2 shares NOTHING else with the
    // query — it stops being a candidate at all, while the clone (sharing
    // the rare partition/broadcast/join terms too) survives
    val strict = Fts.similarDocs(idx, docs, 0L, k = 10, maxDf = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(strict.contains(1L) && !strict.contains(2L),
      s"stopword-only overlap pruned from the candidate join: $strict")
    graft.Caches.releaseAll(spark)
  }

  test("phrase query: positional alignment, overlap-correct") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big table hash join"),            // 1 occurrence
      (2L, "table hash twice: table hash!"),  // 2 occurrences
      (3L, "table then elsewhere hash"),      // terms present, not adjacent
      (4L, "hash table inverted order"),      // reversed
      (5L, "no terms at all")).toDF("doc_id", "text")
    val idx = Fts.buildPositionalIndex(docs, "doc_id", Seq("text"))
    val got = Fts.searchPhrase(idx, "table hash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("occurrences")).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))

    // self-overlapping phrase: "a a" in "a a a" = 2 overlapping hits —
    // position alignment counts both (a substring scan would miss one)
    val rep = Seq((9L, "a a a")).toDF("doc_id", "text")
    val repIdx = Fts.buildPositionalIndex(rep, "doc_id", Seq("text"))
    val reps = Fts.searchPhrase(repIdx, "a a").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("occurrences")).toMap
    assert(reps == Map(9L -> 2L))

    // 3-token phrase through the same index
    val tri = Fts.searchPhrase(idx, "big table hash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("occurrences")).toMap
    assert(tri == Map(1L -> 1L))
  }

  test("NOT query: include-AND membership minus excluded docs, include-only score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark pipelines"),        // matches, tf 2
      (2L, "spark window functions"),       // excluded by 'window'
      (3L, "spark streaming jobs"),         // matches, tf 1
      (4L, "window dressing only"),         // no include term
      (5L, "nothing relevant")).toDF("doc_id", "text")
    val idx = Fts.buildIndex(docs, "doc_id", Seq("text"))
    val got = Fts.searchNotFrom(idx, docs, Seq("spark"), Seq("window"))
      .collect().map(r => r.getAs[Long]("doc_id")).toSeq
    // docs 1 and 3 survive; tf 2 outranks tf 1
    assert(got == Seq(1L, 3L), s"got $got")
  }

  test("NEAR query: order-independent window, pair-counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "table hash adjacent"),            // gap 0
      (2L, "table one two three hash"),       // gap 3
      (3L, "hash comes before the table"),    // reversed, gap 3
      (4L, "table far far far far far far far hash"), // gap 7 — outside n=3
      (5L, "table hash table"),               // pairs: (0,1),(1,2) at n>=0
      (6L, "no terms")).toDF("doc_id", "text")
    val idx = Fts.buildPositionalIndex(docs, "doc_id", Seq("text"))
    def near(n: Int) = Fts.searchNear(idx, "table", "hash", n).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("occurrences")).toMap
    // n=3: docs 1,2,3 match (order-independent); doc 4's gap of 7 is out;
    // doc 5's single hash pairs with BOTH table occurrences
    assert(near(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 2L))
    // n=0: only adjacency survives
    assert(near(0) == Map(1L -> 1L, 5L -> 2L))
    // n=7 admits doc 4
    assert(near(7) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }
}
