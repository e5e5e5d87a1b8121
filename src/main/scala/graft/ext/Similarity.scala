package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and
  * two scale paths — random-hyperplane LSH buckets and an IVF-style
  * coarse-quantizer probe. All vector math is codegen'd column expressions
  * (`zip_with`/`aggregate`), no UDFs.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane p, dim i):
    * xxhash64 scaled to [-1, 1). No RNG state; identical on every executor.
    */
  private def weight(p: Int, i: Column): Column =
    (pmod(xxhash64(concat(lit("hp"), lit(p), lit("_"), i.cast("string"))), lit(1000000L))
      .cast("double") / 500000.0) - 1.0

  /** Sign-bucket of `planes` random hyperplanes packed into a Long. Docs
    * whose vectors lie on the same side of every plane share a bucket;
    * cosine-close vectors collide with high probability.
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    // per-plane sign bits built with a Scala-side loop (planes is small)
    val planeBits: Seq[Column] = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), i => weight(p, i)),
          (v, w) => v * w),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planeBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact brute-force cosine top-k: every query row scored against every
    * corpus row. The query side is broadcast — the corpus (the 100 TB
    * side) streams through one narrow stage; the only shuffle is the
    * final per-query top-k (rank window on query_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
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
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneBucket(col(vecCol), planes).as("qbucket"))
    // multi-probe: original bucket + all buckets within `probeBits` bit
    // flips (recall/cost dial: probes grow as C(planes, probeBits))
    val masks: Seq[Long] = {
      val oneBit = (0 until planes).map(1L << _)
      val twoBit = for (i <- 0 until planes; j <- i + 1 until planes)
        yield (1L << i) | (1L << j)
      (Seq(0L) ++ oneBit ++ (if (probeBits >= 2) twoBit else Seq.empty)).distinct
    }
    val probes = qBase.select(col("query_id"), col("qvec"),
      explode(transform(typedLit(masks), m => col("qbucket").bitwiseXOR(m)))
        .as("bucket"))
      .dropDuplicates("query_id", "bucket")
    val scored = c.join(broadcast(probes), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
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
