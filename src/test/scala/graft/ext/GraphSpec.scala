package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Star 1—2, 1—3 as symmetric edges. */
  private def star = Seq(
    (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")

  test("pagerank: one hand-checked iteration on a star graph") {
    val r1 = Graph.pageRank(star, "src", "dst", damping = 0.85, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // r0 = 1/3 each; center collects both leaves' full mass, each leaf
    // gets half the center's
    assert(close(r1(1L), 0.15 / 3 + 0.85 * (2.0 / 3)), s"got ${r1(1L)}")
    assert(close(r1(2L), 0.15 / 3 + 0.85 * (1.0 / 6)))
    assert(close(r1(3L), 0.15 / 3 + 0.85 * (1.0 / 6)))
    graft.Caches.releaseAll(spark)
  }

  test("pagerank: mass conserved, center dominates, deterministic") {
    val r = Graph.pageRank(star, "src", "dst", damping = 0.85, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9,
      s"no dangling nodes -> total mass 1.0, got ${r.values.sum}")
    assert(r(1L) > r(2L) && r(1L) > r(3L))
    assert(r(2L) == r(3L), "symmetric leaves rank identically")
    val again = Graph.pageRank(star, "src", "dst", damping = 0.85, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(again == r)
    graft.Caches.releaseAll(spark)
  }

  test("pagerank: directed graph with sinks — dangling mass redistributed, sums to 1") {
    // 1 -> 2, 1 -> 3, 2 -> 3: node 3 is a pure sink (no out-edges)
    val directed = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(directed, "src", "dst", damping = 0.85, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L), "sink node 3 IS in the result")
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // r0 = 1/3 each; dangling mass D = r0(3) = 1/3, spread as D/3 to all
    val dm = 1.0 / 9
    assert(close(r(1L), 0.15 / 3 + 0.85 * (0.0 + dm)), s"got ${r(1L)}")
    assert(close(r(2L), 0.15 / 3 + 0.85 * (1.0 / 6 + dm)))
    assert(close(r(3L), 0.15 / 3 + 0.85 * (1.0 / 6 + 1.0 / 3 + dm)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9,
      s"mass conserved WITH sinks, got ${r.values.sum}")
    val r5 = Graph.pageRank(directed, "src", "dst", damping = 0.85, iters = 5)
      .collect().map(x => x.getDouble(1)).sum
    assert(math.abs(r5 - 1.0) < 1e-9, s"still 1.0 after 5 rounds: $r5")
    graft.Caches.releaseAll(spark)
  }

  test("pagerank leaves no persisted blocks behind after release") {
    Graph.pageRank(star, "src", "dst", iters = 3).collect()
    graft.Caches.releaseAll(spark)
    assert(graft.Caches.leakedRddCount(spark) == 0)
  }
}
