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

  test("personalized pagerank: hand-checked round, source bias, unreachable zeros") {
    // path 1 -> 2 -> 3 plus isolated-ish 4 -> 5; teleport to {1}
    val directed = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // r0 = p = (1,0,0,0,0); round 1: in(2) = r0(1)/1 = 1, dangling (3,5)
    // mass D = 0; r1 = d·in + (1-d+d·D)·p
    val r1 = Graph.personalizedPageRank(directed, sources, "src", "dst",
        damping = 0.85, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(close(r1(1L), 0.15), s"got ${r1(1L)}")
    assert(close(r1(2L), 0.85))
    assert(close(r1(3L), 0.0))
    assert(close(r1(4L), 0.0) && close(r1(5L), 0.0),
      "nodes unreachable from the source set rank zero")
    assert(math.abs(r1.values.sum - 1.0) < 1e-12, "mass conserved")
    // more rounds: mass stays on the source's component, still sums to 1
    // (sink 3's dangling mass returns to source 1, never leaks to 4/5)
    val r5 = Graph.personalizedPageRank(directed, sources, "src", "dst",
        damping = 0.85, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r5.values.sum - 1.0) < 1e-9, s"sum ${r5.values.sum}")
    assert(r5(4L) == 0.0 && r5(5L) == 0.0)
    assert(r5(1L) > 0 && r5(2L) > 0 && r5(3L) > 0)
    // two sources split the teleport mass
    val two = Graph.personalizedPageRank(directed, Seq(1L, 4L).toDF("id"),
        "src", "dst", damping = 0.85, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(close(two(1L), 0.075) && close(two(4L), 0.075),
      s"p = 1/2 per source: $two")
    assert(close(two(2L), 0.425) && close(two(5L), 0.425))
    graft.Caches.releaseAll(spark)
  }

  test("pagerank leaves no persisted blocks behind after release") {
    Graph.pageRank(star, "src", "dst", iters = 3).collect()
    graft.Caches.releaseAll(spark)
    assert(graft.Caches.leakedRddCount(spark) == 0)
  }
}
