package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The Bloom prefilter must be invisible in the result: bloom anti/semi
  * equal the plain joins exactly (no false negatives by construction),
  * null keys keep anti-join never-match semantics, and a tiny filter at
  * high fpp still cannot lose rows — it can only route more of them
  * through the exact join.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val customers =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
  private lazy val ids =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))

  test("bloom anti == plain anti on real tables, at loose and tight fpp") {
    val plain = customers.join(ids, Seq("c_custkey"), "left_anti")
      .select("c_custkey").as[Long].collect().toSet
    assert(plain.nonEmpty)
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = BloomJoin.bloomAntiJoin(customers, ids, "c_custkey",
          expectedIds = 1000L, fpp = fpp)
        .select("c_custkey").as[Long].collect().toSet
      assert(bloom == plain, s"fpp=$fpp")
    }
  }

  test("bloom semi == plain semi") {
    val plain = customers.join(ids, Seq("c_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().toSet
    val bloom = BloomJoin.bloomSemiJoin(customers, ids, "c_custkey",
        expectedIds = 1000L)
      .select("c_custkey").as[Long].collect().toSet
    assert(bloom == plain && plain.nonEmpty)
  }

  test("null keys: kept by anti (never match), dropped by semi") {
    val left = Seq(Some(1L), Some(2L), None).toDF("k")
    val right = Seq(1L).toDF("k")
    val anti = BloomJoin.bloomAntiJoin(left, right, "k")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(anti == Set(Some(2L), None))
    val semi = BloomJoin.bloomSemiJoin(left, right, "k")
      .collect().map(_.getLong(0)).toSet
    assert(semi == Set(1L))
  }
}
