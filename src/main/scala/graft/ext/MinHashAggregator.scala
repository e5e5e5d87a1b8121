package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Group-level MinHash: aggregates per-document signatures into one
  * signature for the whole group (elementwise min) — the set-union
  * property of MinHash. Lets the engine estimate Jaccard similarity
  * BETWEEN GROUPS (per-source near-duplication, cluster-vs-cluster
  * overlap) without ever materializing the groups' shingle sets.
  *
  * The SURVEY §4.3 custom-aggregate candidate, realized as a typed
  * `Aggregator` (mergeable buffer => partial aggregation / map-side
  * combine apply automatically).
  */
object MinHashAggregator {

  class MinHashAgg(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      if (sig != null && sig.nonEmpty) {
        var i = 0
        val n = math.min(buf.length, sig.length)
        while (i < n) {
          val v = sig(i)
          if (v < buf(i)) buf(i) = v
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] =
      if (buf.forall(_ == Long.MaxValue)) null else buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column aggregate: `df.groupBy(g).agg(minhash_agg(col("sig")))`. */
  def minhash_agg(sig: Column, numHashes: Int = 64): Column =
    udaf(new MinHashAgg(numHashes)).apply(sig)

  /** Estimated Jaccard between two group signatures (agreement rate). */
  def estJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(a, b, (x, y) => x === y), x => x)).cast("double") /
      size(a)
  }
}
