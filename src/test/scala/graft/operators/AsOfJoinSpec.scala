package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of semantics: latest at-or-before per key") {
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 5L, "c"), (3, 7L, "d"))
      .toDF("k", "ts", "v")
    val right = Seq((1, 8L, "x"), (1, 15L, "y"), (2, 9L, "z"))
      .toDF("k", "ts", "p")
    val got = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"))
      .select("k", "ts", "v", "p_asof")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      (1, 10L, "a", Some("x")),   // 8 <= 10 < 15
      (1, 20L, "b", Some("y")),   // latest <= 20
      (2, 5L, "c", None),         // right row at 9 is after 5
      (3, 7L, "d", None)))        // no right rows for key 3
  }

  test("equal timestamps are inclusive (>= semantics)") {
    val left = Seq((1, 10L, "a")).toDF("k", "ts", "v")
    val right = Seq((1, 10L, "same")).toDF("k", "ts", "p")
    val got = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"))
      .select("p_asof").head.getString(0)
    assert(got == "same")
  }

  test("forward as-of semantics: earliest at-or-after per key") {
    val left = Seq((1, 5L, "a"), (1, 10L, "b"), (1, 20L, "c"), (2, 1L, "d"))
      .toDF("k", "ts", "v")
    val right = Seq((1, 7L, "x"), (1, 10L, "y"), (1, 15L, "z"))
      .toDF("k", "ts", "p")
    val got = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"),
        direction = "forward")
      .select("k", "ts", "v", "p_asof")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      (1, 5L, "a", Some("x")),    // earliest >= 5 is 7
      (1, 10L, "b", Some("y")),   // equal ts inclusive
      (1, 20L, "c", None),        // nothing after 20
      (2, 1L, "d", None)))        // no right rows for key 2
  }

  test("tolerance discards matches with too large a gap, both directions") {
    val left = Seq((1, 10L, "a"), (1, 100L, "b")).toDF("k", "ts", "v")
    val right = Seq((1, 8L, "x"), (1, 104L, "y")).toDF("k", "ts", "p")
    val back = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"),
        tolerance = Some(3L))
      .select("ts", "p_asof")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back == Map(10L -> Some("x"),   // gap 2 <= 3
                       100L -> None))      // latest before is 8: gap 92
    val fwd = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"),
        direction = "forward", tolerance = Some(3L))
      .select("ts", "p_asof")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fwd == Map(10L -> None,          // next after 10 is 104: gap 94
                      100L -> None))        // gap 4 > 3
  }

  test("multiple carried payload columns") {
    val left = Seq((1, 10L)).toDF("k", "ts")
    val right = Seq((1, 9L, "x", 42L)).toDF("k", "ts", "p", "q")
    val got = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p", "q"))
      .select("p_asof", "q_asof").head
    assert(got.getString(0) == "x" && got.getLong(1) == 42L)
  }

  test("nearest as-of: smaller gap wins either direction, ties to backward") {
    val left = Seq((1, 14L, "a"), (1, 16L, "b"), (1, 15L, "c"),
      (1, 3L, "d"), (1, 30L, "e"), (2, 9L, "f"))
      .toDF("k", "ts", "v")
    val right = Seq((1, 10L, "r10"), (1, 20L, "r20")).toDF("k", "ts", "p")
    val got = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"),
        direction = "nearest")
      .select("v", "p_asof")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "a" -> Some("r10"),  // gaps 4 vs 6 -> backward
      "b" -> Some("r20"),  // gaps 6 vs 4 -> forward
      "c" -> Some("r10"),  // tie (5/5) -> backward
      "d" -> Some("r10"),  // no backward match -> forward-only
      "e" -> Some("r20"),  // no forward match -> backward-only
      "f" -> None))        // no right rows for key 2
    // tolerance applies to the CHOSEN match
    val tol = AsOfJoin.asof(left, right, Seq("k"), "ts", Seq("p"),
        direction = "nearest", tolerance = Some(4L))
      .select("v", "p_asof")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(tol("a") == Some("r10") && tol("d") == None && tol("e") == None)
  }
}
