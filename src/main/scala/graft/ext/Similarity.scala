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
    * per candidate pair — norms are per-row, pairs are quadratic). Public:
    * Dedup's cluster-bucketed verifiers reuse it.
    */
  def cosineStaged(a: Column, b: Column, na: Column, nb: Column): Column =
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

  /** Sign-buckets of `planes` random hyperplanes per hash table, packed
    * into one Long per table (classic (m, L) cosine LSH: AND over planes
    * within a table, OR across `tables` independent tables — the
    * OR-amplification that recovers recall when neighbor similarity is
    * moderate). Table t uses plane rows [t·planes, (t+1)·planes).
    */
  def hyperplaneBuckets(vec: Column, planes: Int, tables: Int): Column = {
    val bucketUdf = udf((v: Seq[Double]) => {
      if (v == null) Array.fill(tables)(0L)
      else {
        val w = cachedWeights(planes * tables, v.length)
        Array.tabulate(tables) { t =>
          var bucket = 0L
          var p = 0
          while (p < planes) {
            var proj = 0.0; var i = 0
            val wp = w(t * planes + p)
            while (i < v.length) { proj += v(i) * wp(i); i += 1 }
            if (proj >= 0) bucket |= (1L << p)
            p += 1
          }
          bucket
        }
      }
    })
    bucketUdf(asD(vec))
  }

  /** Single-table sign bucket (table 0 of hyperplaneBuckets). */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    element_at(hyperplaneBuckets(vec, planes, 1), 1)

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

  /** LSH-bucketed ANN top-k: (m, L) cosine LSH — candidates are corpus
    * rows sharing any hash table's bucket with the query (OR across
    * `tables`, AND across `planes` within a table), plus multi-probe
    * (all buckets within `probeBits` bit flips per table) to recover
    * boundary misses. Scale path: the corpus is bucketed once per table
    * (writeable as a bucketed table partitioned by (table, bucket)); each
    * query probes `tables × (1 + planes + …)` buckets instead of the full
    * corpus, and the per-table explosion is of the *bucket id*, not the
    * vector payload's quadratic pair space.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, probeBits: Int = 1, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        l2Norm(col(vecCol)).as("cnorm"),
        posexplode(hyperplaneBuckets(col(vecCol), planes, tables)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        l2Norm(col(vecCol)).as("qnorm"),
        posexplode(hyperplaneBuckets(col(vecCol), planes, tables)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "qbucket"))
    // multi-probe: original bucket + all buckets within `probeBits` bit
    // flips (recall/cost dial: probes grow as C(planes, probeBits))
    val masks: Seq[Long] = {
      val oneBit = (0 until planes).map(1L << _)
      val twoBit = for (i <- 0 until planes; j <- i + 1 until planes)
        yield (1L << i) | (1L << j)
      (Seq(0L) ++ oneBit ++ (if (probeBits >= 2) twoBit else Seq.empty)).distinct
    }
    val probes = qBase.select(col("query_id"), col("qvec"), col("qnorm"), col("table"),
      explode(transform(typedLit(masks), m => col("qbucket").bitwiseXOR(m)))
        .as("bucket"))
      .dropDuplicates("query_id", "table", "bucket")
    val scored = c.join(broadcast(probes), Seq("table", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------
  // IVF coarse quantizer
  // ------------------------------------------------------------------

  /** Shared tight-loop centroid scorer: top-`n` centroid ids for a
    * vector by cosine, ties to the LARGER id. The centroid set is
    * captured in the UDF closure — the stage's task binary is
    * torrent-broadcast once per executor, so the K×dims doubles ship as
    * DATA and the plan stays O(1) in K. The previous expression form
    * inlined one cosine tree + one dims-long literal PER centroid into
    * the plan: the canonical shape at IVF's nlist=16, but under the
    * nClusters ∝ corpus contract (semantic dedup) the serialized stage
    * reached 160 MB per task and OOM'd the driver — caught by the
    * factor-100 stress at K=1600, and at the contract's 100 TB value
    * (K ~ 10⁵) the plan would be GB-scale. Assignment is still a narrow,
    * shuffle-free projection; the dot/norm loops fold left-to-right in
    * double, bit-identical to array_dot/array_l2norm, so assignments
    * (and oracle hashes) are unchanged. A null vector yields a null
    * assignment (it can never pass a cosine verify anyway).
    */
  private def topCentroidsUdf(cents: Array[(Long, Array[Double])],
                              n: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ids = cents.map(_._1)
    val cvs = cents.map(_._2)
    val cnorms = cvs.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      math.sqrt(s)
    }
    udf((v: Seq[Double]) => {
      if (v == null) null
      else {
        val a = v.toArray
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * a(i); i += 1 }
        val nv = math.sqrt(s)
        val sims = new Array[Double](ids.length)
        var k = 0
        while (k < ids.length) {
          val cv = cvs(k)
          var d = 0.0; var j = 0
          while (j < cv.length) { d += a(j) * cv(j); j += 1 }
          val dn = nv * cnorms(k)
          sims(k) = if (dn > 0) d / dn else 0.0
          k += 1
        }
        if (n == 1) {
          // argmax loop — no per-row sort for the assignment path
          var best = 0; var k2 = 1
          while (k2 < sims.length) {
            if (sims(k2) > sims(best) ||
                (sims(k2) == sims(best) && ids(k2) > ids(best))) best = k2
            k2 += 1
          }
          Array(ids(best))
        } else {
          Array.range(0, ids.length)
            .sortBy(k2 => (-sims(k2), -ids(k2)))
            .take(n).map(ids(_))
        }
      }
    })
  }

  /** Nearest-centroid id (ties break to the larger id). */
  def nearestCentroid(vec: Column, cents: Array[(Long, Array[Double])]): Column =
    element_at(topCentroidsUdf(cents, 1)(asD(vec)), 1)

  /** `nprobe` nearest centroid ids, best first. */
  private def probeCentroids(vec: Column, cents: Array[(Long, Array[Double])],
                             nprobe: Int): Column =
    topCentroidsUdf(cents, nprobe)(asD(vec))

  /** Elementwise vector mean as a typed Aggregator — mergeable buffer, so
    * the per-cluster sums combine map-side and only nlist×dims doubles
    * shuffle (vs. exploding the corpus to per-dimension rows).
    */
  class VecMeanAgg extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
      if (v == null || v.isEmpty) b
      else {
        val s = if (b._1.isEmpty) new Array[Double](v.length) else b._1
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        (s, b._2 + 1)
      }
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    override def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) null else b._1.map(_ / b._2).toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Lloyd refinement: `iters` rounds of narrow assignment + per-cluster
    * mean (one map-side-combined shuffle of nlist rows per round). Empty
    * clusters drop out; cosine-space means are used unnormalized (argmax
    * by cosine is scale-invariant in the query vector, and the next
    * round's cosine normalizes the centroid).
    */
  def refineCentroids(corpus: DataFrame, seed: Array[(Long, Array[Double])],
                      iters: Int, vecCol: String = "cvec"): Array[(Long, Array[Double])] = {
    val vecMean = udaf(new VecMeanAgg)
    var cur = seed
    for (_ <- 0 until iters) {
      val next = corpus
        .select(nearestCentroid(col(vecCol), cur).as("centroid_id"),
          col(vecCol).as("v"))
        .groupBy("centroid_id")
        .agg(vecMean(col("v")).as("centroid"))
        .collect()  // nlist rows — the quantizer, not data
        .flatMap { r =>
          if (r.isNullAt(1)) None
          else Some((r.getLong(0), r.getSeq[Double](1).toArray))
        }
      cur = next.sortBy(_._1)
    }
    cur
  }

  /** IVF-style ANN: a coarse quantizer of `nlist` centroids (deterministic
    * seed = smallest nlist ids, refined by `kmeansIters` Lloyd rounds),
    * every corpus vector assigned to its nearest centroid in one narrow
    * pass, queries probe the `nprobe` nearest centroid lists. The
    * assignment materializes as a partitionable column — at scale, write
    * the corpus bucketed by `centroid_id` and probing is partition
    * pruning.
    */
  /** Deterministic, distribution-PROPORTIONAL k-means seeds: the first n
    * rows in XXH64(id) order (id tiebreak) — a stable pseudo-random
    * sample that follows the corpus composition. Lowest-id order would,
    * under the append convention (fresh batches take HIGHER ids), forever
    * seed from the oldest ingest: a retrain over a drifted corpus would
    * place zero seeds in the newly-arrived region and Lloyd iterations
    * alone rarely split a cluster they never seeded — the exact failure
    * [[reindexIvfPq]] exists to cure. orderBy+limit compiles to
    * TakeOrdered (per-partition top-n + driver merge), no full sort.
    */
  private def hashOrderedSeeds(c: DataFrame,
                               n: Int): Array[(Long, Array[Double])] = {
    val id = col(c.columns.head)
    c.orderBy(xxhash64(id), id).limit(n).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, kmeansIters: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), asD(col(vecCol)).as("cvec"))
    val seed = hashOrderedSeeds(c, nlist)
    val cents = refineCentroids(c, seed, kmeansIters)

    val assigned = c.select(col("corpus_id"), col("cvec"),
      l2Norm(col("cvec")).as("cnorm"),
      nearestCentroid(col("cvec"), cents).as("centroid_id"))

    val qProbes = queries
      .select(col(idCol).as("query_id"), asD(col(vecCol)).as("qvec"))
      .select(col("query_id"), col("qvec"), l2Norm(col("qvec")).as("qnorm"),
        explode(probeCentroids(col("qvec"), cents, nprobe)).as("centroid_id"))

    val scored = assigned.join(broadcast(qProbes), Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------
  // Product quantization (memory-compressed ANN)
  // ------------------------------------------------------------------

  /** A trained PQ codebook: `centroids(s)(c)` is the `dsub`-dim centroid
    * `c` of subspace `s`. Size m·ksub·dsub doubles — driver/broadcast
    * material by construction, like the IVF quantizer.
    */
  case class PqCodebook(m: Int, dsub: Int, centroids: Array[Array[Array[Double]]])
      extends Serializable {
    def ksub: Int = centroids(0).length
  }

  private def sliceVec(v: Seq[Double], s: Int, dsub: Int): Array[Double] = {
    val out = new Array[Double](dsub)
    var i = 0
    while (i < dsub) { out(i) = v(s * dsub + i); i += 1 }
    out
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Train a product quantizer: split `dims` into `m` subspaces of
    * dims/m, k-means (`ksub` centroids, `iters` Lloyd rounds) in EACH
    * subspace — all m subspace k-means run in ONE dataflow per round
    * (explode to (sub, subvec) rows, assign via broadcast codebook,
    * mergeable mean agg keyed by (sub, centroid), collect m·ksub rows).
    * Deterministic seeds: the first `ksub` vectors in id order.
    */
  def trainPq(corpus: DataFrame, m: Int = 8, ksub: Int = 32, iters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              // precollected hash-ordered seed vectors (the first ksub in
              // XXH64(id) order) — [[writeIvfPqIndex]] shares one seed
              // collection between the coarse quantizer and the codebook
              // instead of running two identical TakeOrdered jobs
              preSeeds: Option[Array[Seq[Double]]] = None): PqCodebook = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).cast("long").as("id"), asD(col(vecCol)).as("v"))
    // hash-ordered seeds (see hashOrderedSeeds): a retrain over an
    // appended corpus must seed sub-centroids proportionally to the
    // CURRENT distribution, not the oldest ingest's ids
    val seedRows = preSeeds.getOrElse(
      c.orderBy(xxhash64(col("id")), col("id")).limit(ksub)
        .collect().map(_.getSeq[Double](1)))
    require(seedRows.nonEmpty, "trainPq: empty corpus")
    // dims read off the collected seeds — the separate size() head() was
    // a whole extra job over the corpus just to learn the vector width
    val dims = seedRows.head.length
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    var cb = PqCodebook(m, dsub,
      Array.tabulate(m)(s => seedRows.map(v => sliceVec(v, s, dsub)).toArray))

    val subRows = c.select(col("v")).as[Seq[Double]]
      .flatMap(v => (0 until m).map(s => (s, sliceVec(v, s, dsub).toSeq)))
      .toDF("sub", "subvec")
    val vecMean = udaf(new VecMeanAgg)
    for (_ <- 0 until iters) {
      val frozen = cb
      val assign = udf((s: Int, sv: Seq[Double]) => {
        val cents = frozen.centroids(s)
        val a = sv.toArray
        var best = 0; var bestD = Double.MaxValue; var ci = 0
        while (ci < cents.length) {
          val d = l2sq(a, cents(ci)); if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        best
      })
      val next = subRows
        .select(col("sub"), assign(col("sub"), col("subvec")).as("cid"), col("subvec"))
        .groupBy("sub", "cid").agg(vecMean(col("subvec")).as("centroid"))
        .collect() // m·ksub quantizer rows, not data
      val updated = cb.centroids.map(_.map(identity))
      next.foreach { r =>
        if (!r.isNullAt(2))
          updated(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      cb = PqCodebook(m, dsub, updated)
    }
    cb
  }

  /** Encode vectors to m byte-sized codes + the decoded-vector norm (the
    * two things ADC scoring needs). 64 floats → 8 codes ≈ 32× memory
    * compression on the corpus side.
    */
  def withPqCodes(df: DataFrame, cb: PqCodebook,
                  vecCol: String = "embedding",
                  codesCol: String = "pq_codes",
                  normCol: String = "pq_norm"): DataFrame = {
    val enc = udf((v: Seq[Double]) => {
      val codes = new Array[Int](cb.m)
      var normSq = 0.0
      var s = 0
      while (s < cb.m) {
        val sv = sliceVec(v, s, cb.dsub)
        val cents = cb.centroids(s)
        var best = 0; var bestD = Double.MaxValue; var ci = 0
        while (ci < cents.length) {
          val d = l2sq(sv, cents(ci)); if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        codes(s) = best
        val bc = cents(best)
        var i = 0
        while (i < cb.dsub) { normSq += bc(i) * bc(i); i += 1 }
        s += 1
      }
      (codes, math.sqrt(normSq))
    })
    df.withColumn("__enc", enc(asD(col(vecCol))))
      .withColumn(codesCol, col("__enc._1"))
      .withColumn(normCol, col("__enc._2"))
      .drop("__enc")
  }

  /** PQ ANN top-k via asymmetric distance computation: per query, a
    * lookup table LUT(s)(c) = dot(q_sub, centroid(s)(c)) (m·ksub dot
    * products, driver-side — queries are the small side by contract);
    * scoring a corpus code is then m table adds instead of `dims`
    * multiplies, over an 8-byte code instead of a 256-byte vector.
    * cosine ≈ ΣLUT / (|q|·|decode(x)|).
    */
  /** @param rerank if > 0, the ADC pass only builds a `rerank`-sized
    *   shortlist per query and the final top-k is exact cosine over the
    *   shortlist's ORIGINAL vectors (FAISS's refine stage). The exact
    *   pass touches k·rerank vectors per query instead of the corpus —
    *   the compressed scan does the heavy lifting, the refine fixes the
    *   quantization error.
    */
  /** Per-query ADC lookup tables: LUT(s)(c) = dot(q_sub, centroid(s)(c)),
    * plus the query norm. m·ksub doubles per query, built driver-side —
    * queries are the small side by contract (documented at [[pqTopK]]).
    */
  private def adcLutRows(queries: DataFrame, cb: PqCodebook,
                         idCol: String, vecCol: String)
      : Array[(Long, Array[Array[Double]], Double)] =
    queries
      .select(col(idCol).cast("long").as("query_id"), asD(col(vecCol)).as("qvec"))
      .collect()
      .map { r =>
        val qid = r.getLong(0); val q = r.getSeq[Double](1)
        val lut = Array.tabulate(cb.m, cb.ksub) { (s, c) =>
          val qs = sliceVec(q, s, cb.dsub); val ct = cb.centroids(s)(c)
          var acc = 0.0; var i = 0
          while (i < cb.dsub) { acc += qs(i) * ct(i); i += 1 }
          acc
        }
        var nq = 0.0; q.foreach(x => nq += x * x)
        (qid, lut, math.sqrt(nq))
      }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, cb: PqCodebook,
             rerank: Int = 0,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val corpusStd = corpus.select(col(idCol).as("corpus_id"), asD(col(vecCol)).as("cvec"))
    val enc = withPqCodes(corpusStd, cb, "cvec").drop("cvec")
    val qRows = adcLutRows(queries, cb, idCol, vecCol)
    val luts = spark.sparkContext.broadcast(
      qRows.map { case (qid, lut, nq) => qid -> ((lut, nq)) }.toMap)
    val score = udf((qid: Long, codes: Seq[Int], decNorm: Double) => {
      val (lut, nq) = luts.value(qid)
      var acc = 0.0; var s = 0
      while (s < lut.length) { acc += lut(s)(codes(s)); s += 1 }
      if (nq * decNorm > 0) acc / (nq * decNorm) else 0.0
    })
    val qIds = qRows.map(_._1).toSeq
    val scored = enc
      .crossJoin(broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(qIds.map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType))))))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        score(col("query_id"), col("pq_codes"), col("pq_norm")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    } else {
      val shortlist = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= math.max(rerank, k))
        .select("query_id", "corpus_id")
      val qVecs = queries
        .select(col(idCol).cast("long").as("query_id"), asD(col(vecCol)).as("qvec"))
        .select(col("query_id"), col("qvec"), l2Norm(col("qvec")).as("qnorm"))
      val exact = shortlist
        .join(corpusStd.withColumn("cnorm", l2Norm(col("cvec"))), Seq("corpus_id"))
        .join(broadcast(qVecs), Seq("query_id"))
        .select(col("query_id"), col("corpus_id"),
          cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
      exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
  }

  // ------------------------------------------------------------------
  // IVF index layout (persisted)
  // ------------------------------------------------------------------

  /** Materialize the IVF index: corpus + staged norms + centroid
    * assignment written as parquet DISK-PARTITIONED by `centroid_id` (one
    * directory per inverted list — the FAISS IVF layout expressed as a
    * Spark partitioned table). Probing `nprobe` lists then becomes
    * partition PRUNING at scan time: a probe scans nprobe directories and
    * never opens the rest (proven in SimilaritySpec). Returns the trained
    * quantizer for probe-time use; at scale it would be persisted beside
    * the index (nlist × dims doubles — trivially small).
    */
  def writeIvfIndex(corpus: DataFrame, path: String,
                    nlist: Int = 16, kmeansIters: Int = 1,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Array[(Long, Array[Double])] = {
    val c = corpus.select(col(idCol).as("corpus_id"), asD(col(vecCol)).as("cvec"))
    val seed = hashOrderedSeeds(c, nlist)
    val cents = refineCentroids(c, seed, kmeansIters)
    c.select(col("corpus_id"), col("cvec"), l2Norm(col("cvec")).as("cnorm"),
        nearestCentroid(col("cvec"), cents).as("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    cents
  }

  /** ANN probe against a persisted IVF index: queries join the index on
    * `centroid_id` — a partition column, so the broadcast join triggers
    * dynamic partition pruning (only the probed lists' directories are
    * scanned; static `isin` pruning is equivalent when the probe set is
    * driver-known). Same verify/rank shape as ivfTopK.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       cents: Array[(Long, Array[Double])],
                       queries: DataFrame, k: Int, nprobe: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val assigned = spark.read.parquet(path)
    val qProbes = queries
      .select(col(idCol).as("query_id"), asD(col(vecCol)).as("qvec"))
      .select(col("query_id"), col("qvec"), l2Norm(col("qvec")).as("qnorm"),
        explode(probeCentroids(col("qvec"), cents, nprobe)).as("centroid_id"))
    val scored = assigned.join(broadcast(qProbes), Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------
  // IVF+PQ composed index (the 100 TB ANN layout)
  // ------------------------------------------------------------------

  /** The driver-side half of a persisted IVF+PQ index: the coarse
    * quantizer (nlist × dims doubles) and the PQ codebook (m·ksub·dsub
    * doubles) — both trivially broadcastable; at scale they'd be
    * persisted beside the table.
    */
  case class IvfPqIndex(cents: Array[(Long, Array[Double])], cb: PqCodebook)

  // The IVF+PQ table lives under `path/v=V`, V named by the write-once
  // `path/iv-N` pointer (highest wins) — the same reader-safe versioning
  // as the dedup signature store: appends land INSIDE the live version,
  // only a full rewrite (fresh build or [[reindexIvfPq]]) creates v=V+1
  // and flips the pointer, and the version superseded by a rewrite is
  // retained ONE MORE rewrite cycle so a probe that resolved its paths
  // mid-rewrite still finds them.

  private def indexFs(spark: org.apache.spark.sql.SparkSession,
                      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def readIndexVersion(fs: org.apache.hadoop.fs.FileSystem,
                                      path: String): Int = {
    val base = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(base)) 0
    else fs.listStatus(base).filter(_.isFile).flatMap { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("iv-")) scala.util.Try(nm.drop(3).toInt).toOption
      else None
    }.sorted.lastOption.getOrElse(0)
  }

  private[graft] def liveIndexDir(spark: org.apache.spark.sql.SparkSession,
                                  path: String): String =
    s"$path/v=${readIndexVersion(indexFs(spark, path), path)}"

  private def commitIndexVersion(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String, n: Int): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.iv-$n.tmp")
    val p = new org.apache.hadoop.fs.Path(s"$path/iv-$n")
    val out = fs.create(tmp, true)
    try out.write(s"$n\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, p), s"index-version commit rename failed for $p")
    (0 until n).foreach { m =>
      val old = new org.apache.hadoop.fs.Path(s"$path/iv-$m")
      if (fs.exists(old)) fs.delete(old, false)
    }
  }

  /** Materialize the COMPOSED IVF+PQ index — the layout a 100 TB ANN
    * corpus actually wants (FAISS IVFPQ with by_residual=false, expressed
    * as a Spark partitioned table): parquet partitioned by `centroid_id`
    * (probe = partition pruning), rows carrying the 8-byte PQ codes (ADC
    * scores codes, never vectors) AND the original vector (consulted only
    * for the shortlist refine — parquet is columnar, so the ADC scan's
    * column pruning never reads it; proven in ScaleSpec).
    */
  def writeIvfPqIndex(corpus: DataFrame, path: String,
                      nlist: Int = 16, kmeansIters: Int = 1,
                      m: Int = 8, ksub: Int = 32, pqIters: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): IvfPqIndex = {
    val spark = corpus.sparkSession
    val fs = indexFs(spark, path)
    val prev = readIndexVersion(fs, path)
    val next = prev + 1
    // the training passes (seeds, Lloyd rounds, PQ iterations, the final
    // encode) all re-read the same cast corpus — stage it once for the
    // build's duration (released by the scope below); and ONE TakeOrdered
    // collect seeds BOTH quantizers (identical prefix of the same
    // hash-ordered corpus: rows 0..nlist-1 coarse, 0..ksub-1 PQ — the
    // previous shape ran the same ordered collect twice and a separate
    // size() job for the dims)
    graft.Caches.scoped {
    val c = graft.Caches.stage(corpus.select(
      col(idCol).cast("long").as("corpus_id"), asD(col(vecCol)).as("cvec")))
    val seedAll = c.orderBy(xxhash64(col("corpus_id")), col("corpus_id"))
      .limit(math.max(nlist, ksub)).collect()
    val seed = seedAll.take(nlist)
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = refineCentroids(c, seed, kmeansIters)
    val cb = trainPq(c, m, ksub, pqIters, idCol = "corpus_id",
      vecCol = "cvec",
      preSeeds = Some(seedAll.take(ksub).map(_.getSeq[Double](1))))
    // the rewrite lands BESIDE the live version (the input may BE the
    // live version, as in reindexIvfPq) and the pointer is the cut-over;
    // a crash before the commit leaves an orphan v=next the next
    // rewrite's static overwrite clears
    withPqCodes(c, cb, "cvec")
      .select(col("corpus_id"), col("pq_codes"), col("pq_norm"),
        col("cvec"), l2Norm(col("cvec")).as("cnorm"),
        nearestCentroid(col("cvec"), cents).as("centroid_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("centroid_id").parquet(s"$path/v=$next")
    commitIndexVersion(fs, path, next)
    // deferred sweep: versions STRICTLY BELOW the one live when this
    // rewrite started — prev itself survives until the NEXT rewrite, so
    // a probe planned against it keeps its dirs
    val base = new org.apache.hadoop.fs.Path(path)
    fs.listStatus(base).filter(_.isDirectory).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("v=") &&
          scala.util.Try(nm.drop(2).toInt).toOption.exists(_ < prev))
        fs.delete(st.getPath, true)
    }
    IvfPqIndex(cents, cb)
    }
  }

  /** INCREMENTAL append to a persisted IVF+PQ index — the ANN analogue of
    * the dedup signature store's append: new vectors are assigned to the
    * EXISTING coarse centroids and encoded with the EXISTING codebook,
    * then appended to only the touched list partitions (mode=append on
    * the partition column after a repartition on it — one file per
    * touched list, untouched lists never read or written). O(batch), no
    * retrain, no index rewrite; probes see the new rows immediately
    * because probing is just partition-pruned scanning.
    *
    * The honest drift caveat: a frozen quantizer/codebook quantizes a
    * DRIFTED batch distribution poorly (recall decays as batches stop
    * resembling the training corpus) — the periodic retrain + rewrite is
    * the offline maintenance job, exactly like signature-store
    * compaction. Ids must be unique across all appends (the store
    * contract).
    */
  def appendIvfPqIndex(batch: DataFrame, path: String, idx: IvfPqIndex,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    val c = batch.select(col(idCol).cast("long").as("corpus_id"),
      asD(col(vecCol)).as("cvec"))
    withPqCodes(c, idx.cb, "cvec")
      .select(col("corpus_id"), col("pq_codes"), col("pq_norm"),
        col("cvec"), l2Norm(col("cvec")).as("cnorm"),
        nearestCentroid(col("cvec"), idx.cents).as("centroid_id"))
      .repartition(col("centroid_id"))
      .write.mode("append").partitionBy("centroid_id")
      .parquet(liveIndexDir(batch.sparkSession, path))
  }

  /** The offline maintenance job [[appendIvfPqIndex]]'s drift caveat
    * names: RETRAIN the coarse quantizer and PQ codebook from the CURRENT
    * corpus (originals + every appended batch, read back from the live
    * index — vectors are stored alongside the codes precisely so
    * maintenance never needs the source table), re-encode, and rewrite
    * the partitioned index. The cut-over is the same write-once version
    * pointer as a fresh build: readers planned against the old version
    * keep their dirs for one more rewrite cycle, a crashed retrain leaves
    * the old pointer in charge. O(corpus) by design — the amortized
    * analogue of signature-store compaction, run between ingests.
    * Returns the new index halves; callers must probe with THESE (the old
    * IvfPqIndex's centroids no longer match the new partition layout).
    */
  def reindexIvfPq(spark: org.apache.spark.sql.SparkSession, path: String,
                   nlist: Int = 16, kmeansIters: Int = 1,
                   m: Int = 8, ksub: Int = 32, pqIters: Int = 2): IvfPqIndex = {
    val current = spark.read.parquet(liveIndexDir(spark, path))
      .select(col("corpus_id"), col("cvec"))
    writeIvfPqIndex(current, path, nlist, kmeansIters, m, ksub, pqIters,
      idCol = "corpus_id", vecCol = "cvec")
  }

  /** Probe the persisted IVF+PQ index: (1) queries explode to their
    * `nprobe` nearest lists and the broadcast join on the partition
    * column dynamic-partition-prunes the scan to those directories;
    * (2) ADC over the lists' 8-byte codes builds a `rerank`-sized
    * shortlist per query — this scan projects only (centroid_id,
    * corpus_id, pq_codes, pq_norm), so the stored vectors are never read;
    * (3) the refine re-joins the shortlist against the index ON THE
    * PARTITION COLUMN TOO (`centroid_id` rides along from the probe), so
    * the exact-cosine pass is also pruned to the probed lists instead of
    * rescanning the corpus.
    */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         idx: IvfPqIndex, queries: DataFrame, k: Int,
                         nprobe: Int = 4, rerank: Int = 50,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         adcObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val qRows = adcLutRows(queries, idx.cb, idCol, vecCol)
    val luts = spark.sparkContext.broadcast(
      qRows.map { case (qid, lut, nq) => qid -> ((lut, nq)) }.toMap)
    val adcScore = udf((qid: Long, codes: Seq[Int], decNorm: Double) => {
      val (lut, nq) = luts.value(qid)
      var acc = 0.0; var s = 0
      while (s < lut.length) { acc += lut(s)(codes(s)); s += 1 }
      if (nq * decNorm > 0) acc / (nq * decNorm) else 0.0
    })

    val qProbes = queries
      .select(col(idCol).cast("long").as("query_id"), asD(col(vecCol)).as("qvec"))
      .select(col("query_id"),
        explode(probeCentroids(col("qvec"), idx.cents, nprobe)).as("centroid_id"))

    // resolve the live version ONCE; both passes read it, and a rewrite
    // that bumps the pointer mid-probe retains this version's dirs until
    // the rewrite after it
    val live = liveIndexDir(spark, path)
    // ADC pass: codes only — cvec/cnorm never enter this projection
    val adcRaw = spark.read.parquet(live)
      .select("centroid_id", "corpus_id", "pq_codes", "pq_norm")
      .join(broadcast(qProbes), Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("centroid_id"),
        adcScore(col("query_id"), col("pq_codes"), col("pq_norm")).as("adc"))
    // optional scale instrumentation (the Bench 10x stress): rows the ADC
    // actually scored, and how many inverted lists the probe touched —
    // lists touched must stay = nprobe as the corpus grows
    val adc = adcObs match {
      case Some(obs) => adcRaw.observe(obs,
        count(lit(1)).as("adc_rows"),
        // exact at probe cardinalities (HLL++ sparse mode is exact for
        // tiny sets); observe forbids DISTINCT aggregates proper
        approx_count_distinct(col("centroid_id")).as("lists_touched"))
      case None => adcRaw
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("corpus_id"))
    val shortlist = adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= math.max(rerank, k))
      .select("query_id", "corpus_id", "centroid_id")

    // refine: exact cosine over the shortlist's ORIGINAL vectors; the
    // broadcast join carries centroid_id so this scan prunes to the
    // probed lists as well
    val qVecs = queries
      .select(col(idCol).cast("long").as("query_id"), asD(col(vecCol)).as("qvec"))
      .select(col("query_id"), col("qvec"), l2Norm(col("qvec")).as("qnorm"))
    val exact = spark.read.parquet(live)
      .select("centroid_id", "corpus_id", "cvec", "cnorm")
      .join(broadcast(shortlist), Seq("centroid_id", "corpus_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineStaged(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")).as("cosine"))
    val wf = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id"))
    exact.withColumn("rank", row_number().over(wf)).filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------
  // Recall measurement
  // ------------------------------------------------------------------

  /** Per-query recall@k of an approximate top-k result against the exact
    * one: |approx ∩ exact| / k. Both inputs are (query_id, corpus_id, ...)
    * top-k frames.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = exact.select("query_id", "corpus_id")
      .join(approx.select("query_id", "corpus_id"),
        Seq("query_id", "corpus_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall"))
  }
}
