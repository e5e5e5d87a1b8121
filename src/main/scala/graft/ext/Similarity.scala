package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and
  * two scale paths — random-hyperplane LSH buckets and an IVF-style
  * coarse-quantizer probe. Vector kernels are native codegen'd Catalyst
  * expressions (see note below); candidate generation and ranking are
  * declarative plans.
  */
object Similarity {

  // Vector kernels are native codegen'd Catalyst expressions
  // (graft.functions.VectorExpressions): higher-order column functions
  // (zip_with/aggregate) never enter whole-stage codegen and evaluate
  // interpreted with per-element boxing, and Scala UDFs pay an encoder
  // round-trip per call — the custom Expression emits a primitive double
  // loop inline in the generated stage. All three forms fold
  // left-to-right in double (same as DuckDB's list kernels), so oracle
  // hash parity is preserved; VectorExpressionsSpec asserts bit-equality.

  import graft.functions.VectorExpressions.{array_dot, array_l2norm}

  private def asD(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column = array_dot(a, b)

  def l2Norm(a: Column): Column = array_l2norm(a)

  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Cosine from a precomputed staged norm pair (avoids recomputing norms
    * per candidate pair — norms are per-row, pairs are quadratic).
    */
  private def cosineStaged(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, array_dot(a, b) / (na * nb)).otherwise(lit(0.0))

  /** Deterministic hyperplane weight matrix for (plane, dim) — splitmix64
    * scaled to [-1, 1); identical on every executor, no RNG state.
    */
  private def weights(planes: Int, dims: Int): Array[Array[Double]] = {
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(planes, dims) { (p, i) =>
      ((mix(p.toLong * 131071 + i) & Long.MaxValue).toDouble /
        Long.MaxValue.toDouble) * 2.0 - 1.0
    }
  }

  /** Per-JVM weight-matrix memo (static object state — never serialized;
    * each executor builds its matrix once per (planes, dims)).
    */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def cachedWeights(planes: Int, dims: Int): Array[Array[Double]] =
    weightCache.computeIfAbsent((planes, dims), { case (p, d) => weights(p, d) })

  /** Sign-bucket of `planes` random hyperplanes packed into a Long. Docs
    * whose vectors lie on the same side of every plane share a bucket;
    * cosine-close vectors collide with high probability. Weight rows are
    * materialized lazily up to the observed dimensionality.
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    val bucketUdf = udf((v: Seq[Double]) => {
      if (v == null) 0L
      else {
        val w = cachedWeights(planes, v.length)
        var bucket = 0L
        var p = 0
        while (p < planes) {
          var proj = 0.0; var i = 0
          val wp = w(p)
          while (i < v.length) { proj += v(i) * wp(i); i += 1 }
          if (proj >= 0) bucket |= (1L << p)
          p += 1
        }
        bucket
      }
    })
    bucketUdf(asD(vec))
  }

  /** Exact brute-force cosine top-k: every query row scored against every
    * corpus row. The query side is broadcast — the corpus (the 100 TB
    * side) streams through one narrow stage; the only shuffle is the
    * final per-query top-k (rank window on query_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      l2Norm(col(vecCol)).as("cnorm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      l2Norm(col(vecCol)).as("qnorm"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN top-k: candidates limited to the query's hyperplane
    * bucket (multi-probe: exact bucket plus all 1-bit-flip neighbors, which
    * recovers most boundary misses). Scale path: the corpus is bucketed
    * once (writeable as a bucketed table); each query probes
    * `planes + 1` buckets instead of the full corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, probeBits: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      l2Norm(col(vecCol)).as("cnorm"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      l2Norm(col(vecCol)).as("qnorm"),
      hyperplaneBucket(col(vecCol), planes).as("qbucket"))
    // multi-probe: original bucket + all buckets within `probeBits` bit
    // flips (recall/cost dial: probes grow as C(planes, probeBits))
    val masks: Seq[Long] = {
      val oneBit = (0 until planes).map(1L << _)
      val twoBit = for (i <- 0 until planes; j <- i + 1 until planes)
        yield (1L << i) | (1L << j)
      (Seq(0L) ++ oneBit ++ (if (probeBits >= 2) twoBit else Seq.empty)).distinct
    }
    val probes = qBase.select(col("query_id"), col("qvec"), col("qnorm"),
      explode(transform(typedLit(masks), m => col("qbucket").bitwiseXOR(m)))
        .as("bucket"))
      .dropDuplicates("query_id", "bucket")
    val scored = c.join(broadcast(probes), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: a coarse quantizer of `nlist` centroids (deterministic
    * corpus sample), every corpus vector assigned to its nearest centroid
    * once, queries probe the `nprobe` nearest centroid lists. The
    * assignment materializes as a partitionable column — at scale, write
    * the corpus bucketed by `centroid_id` and probing is partition
    * pruning.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    // deterministic sample as centroids: smallest nlist ids (stable, cheap;
    // k-means refinement is a drop-in upgrade behind the same shape)
    val centroids = c.orderBy("corpus_id").limit(nlist)
      .select(col("corpus_id").as("centroid_id"), col("cvec").as("centroid"))
    val cent = broadcast(centroids)

    val assigned = c.join(cent)
      .select(col("corpus_id"), col("cvec"), col("centroid_id"),
        cosine(col("cvec"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("corpus_id").orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rn") === 1)
      .select(col("corpus_id"), col("cvec"), col("centroid_id"))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val qProbes = q.join(cent)
      .select(col("query_id"), col("qvec"), col("centroid_id"),
        cosine(col("qvec"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qvec"), col("centroid_id"))

    val scored = assigned.join(broadcast(qProbes), Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
