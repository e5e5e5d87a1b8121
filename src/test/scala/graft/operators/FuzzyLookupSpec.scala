package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SymSpell deletion-neighborhood lookup: completeness vs the brute-force
  * cross join it exists to avoid, at both supported depths, and the
  * no-cartesian plan guarantee.
  */
class FuzzyLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // random-ish short words over a small alphabet: dense edit-distance
  // neighborhoods, including transpositions (distance 2) and length-0/1
  // edge strings
  private val rnd = new scala.util.Random(13L)
  private lazy val dictWords =
    (Seq("", "a", "ab", "spark", "spank", "sprak", "park", "stark",
      "parka", "lampshade") ++
      (0 until 120).map(_ =>
        (0 until 3 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString)).distinct
  private lazy val queryWords =
    (Seq("spark", "sprk", "spakr", "zpark", "") ++
      (0 until 40).map(_ =>
        (0 until 3 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString)).distinct

  private def brute(maxDist: Int): Set[(String, String)] =
    (for {
      q <- queryWords; t <- dictWords
      if levDist(q, t) <= maxDist
    } yield (q, t)).toSet

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("deletion-neighborhood lookup == brute force at d=1 and d=2") {
    val dict = dictWords.toDF("term")
    val queries = queryWords.toDF("q")
    for (d <- Seq(1, 2)) {
      val got = FuzzyLookup.lookup(queries, "q", dict, "term", maxDist = d)
        .select("q", "term").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == brute(d), s"divergence from brute force at d=$d")
    }
  }

  test("reported distances are the true edit distances") {
    val got = FuzzyLookup.lookup(queryWords.toDF("q"), "q",
      dictWords.toDF("term"), "term", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, t, dist) =>
      assert(dist == levDist(q, t), s"($q, $t): $dist != ${levDist(q, t)}")
    }
  }

  test("persisted dict index: lookupIndexed == lookup; dict side scans without Exchange") {
    val dict = dictWords.toDF("term")
    val queries = queryWords.toDF("q")
    FuzzyLookup.writeDictIndex(dict, "term", "t_fuzzy_idx", d = 1,
      numBuckets = 8)
    try {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val indexed = FuzzyLookup.lookupIndexed(queries, "q", "t_fuzzy_idx",
        "term", maxDist = 1)
      val direct = FuzzyLookup.lookup(queries, "q", dict, "term", maxDist = 1)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(rows(indexed) == rows(direct) && rows(indexed).nonEmpty)
      // the bucketed dict side joins without an Exchange of its own —
      // the distinct/verify stages shuffle identically in both plans, so
      // the saved dict-side shuffle shows as strictly fewer exchanges
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      assert(exchanges(indexed) < exchanges(direct),
        s"indexed=${exchanges(indexed)} direct=${exchanges(direct)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS t_fuzzy_idx")
    }
  }

  test("the plan is a hash join on variants — no cartesian product") {
    val df = FuzzyLookup.lookup(queryWords.toDF("q"), "q",
      dictWords.toDF("term"), "term", maxDist = 1)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy lookup must never cross-join:\n$plan")
  }
}
