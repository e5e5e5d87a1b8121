package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine math is correct") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.0, 1.0, -1.0))
  }

  test("brute-force top-k: self-similar neighbors rank first, k respected") {
    val queries = emb.filter(col("vec_id") < 3)
    val res = Similarity.bruteForceTopK(emb, queries, k = 5)
    val byQuery = res.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    for ((_, rows) <- byQuery) {
      assert(rows.length == 5)
      val cosines = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k recall against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val approx = Similarity.lshTopK(emb, queries, k = 3, planes = 6, probeBits = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall")
  }

  test("IVF top-k recall against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 3, nlist = 8, nprobe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall")
  }

  test("IVF k-means refinement improves average recall over seed centroids") {
    val embD = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val queries = embD.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(embD, queries, k = 5)
    def avgRecall(iters: Int): Double = {
      val approx = Similarity.ivfTopK(embD, queries, k = 5, nlist = 16,
        nprobe = 6, kmeansIters = iters)
      val r = Similarity.recallAtK(exact, approx, 5).collect()
        .map(_.getDouble(1))
      r.sum / r.length
    }
    val seed = avgRecall(0)
    val refined = avgRecall(1)
    assert(refined > seed, s"k-means recall $refined <= seed recall $seed")
  }

  test("PQ: 32x-compressed codes, deterministic encode, recall vs brute force") {
    val embD = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val cb = Similarity.trainPq(embD, m = 8, ksub = 32, iters = 2)
    assert(cb.m == 8 && cb.dsub == 8 && cb.ksub == 32)
    // deterministic encode
    val e1 = Similarity.withPqCodes(embD, cb).select("vec_id", "pq_codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val e2 = Similarity.withPqCodes(embD, cb).select("vec_id", "pq_codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(e1 == e2)
    assert(e1.values.forall(_.length == 8), "64 floats -> 8 codes")
    // recall@5 against exact brute force: raw ADC is lossy on these
    // near-random embeddings; the refine stage (ADC shortlist -> exact
    // re-rank of 50 of 500 vectors) recovers it
    val queries = embD.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(embD, queries, k = 5)
    val raw = Similarity.pqTopK(embD, queries, k = 5, cb)
    val rawRec = Similarity.recallAtK(exact, raw, 5).collect().map(_.getDouble(1))
    val refined = Similarity.pqTopK(embD, queries, k = 5, cb, rerank = 50)
    val refRec = Similarity.recallAtK(exact, refined, 5).collect().map(_.getDouble(1))
    val rawAvg = rawRec.sum / rawRec.length
    val refAvg = refRec.sum / refRec.length
    println(s"PQ recall@5: raw ADC $rawAvg -> refined $refAvg")
    assert(refAvg > rawAvg, "refine must improve recall")
    assert(refAvg >= 0.7, s"refined PQ avg recall@5 $refAvg")
  }

  test("IVF+PQ append: only touched lists gain files; appended rows probe-visible") {
    val dir = graft.Caches.newTempDir("graft_ivfpq_append_spec").toString
    val idx = Similarity.writeIvfPqIndex(emb, dir, nlist = 8, kmeansIters = 1,
      m = 8, ksub = 16, pqIters = 1)
    def filesPerList(): Map[String, Int] = {
      val live = new java.io.File(
        Similarity.liveIndexDir(spark, dir).stripPrefix("file:"))
      live.listFiles().filter(_.getName.startsWith("centroid_id="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    val before = filesPerList()
    // append ONE vector (a copy of vec 0 under a fresh id): exactly one
    // list — its original's — gains exactly one file
    val one = emb.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    Similarity.appendIvfPqIndex(one, dir, idx)
    val after = filesPerList()
    val changed = after.filter { case (k, n) => before.getOrElse(k, 0) != n }
    assert(changed.size == 1 &&
      changed.values.head == before(changed.keys.head) + 1,
      s"one touched list, one new file: before=$before after=$after")
    // the appended copy is immediately probe-visible: querying WITH it
    // finds original vec 0 at cosine exactly 1.0
    val hit = Similarity.ivfPqTopKFromIndex(spark, dir, idx, one, k = 3,
        nprobe = 2, rerank = 20)
      .filter(col("corpus_id") === 0L)
      .select("cosine").collect()
    assert(hit.length == 1 && math.abs(hit.head.getDouble(0) - 1.0) < 1e-12,
      s"appended copy must find its original at cosine 1.0: ${hit.toSeq}")
    graft.Caches.releaseAll(spark)
  }

  test("reindexIvfPq: retrain recovers recall lost to a drifted append, old version retained one cycle") {
    val dir = graft.Caches.newTempDir("graft_ivfpq_reindex").toString
    val base = emb.filter(col("vec_id") < 400).select("vec_id", "embedding")
    val idx0 = Similarity.writeIvfPqIndex(base, dir, nlist = 8, kmeansIters = 1,
      m = 8, ksub = 16, pqIters = 1)
    // drifted batch: a TIGHT off-distribution blob (every dim pulled to a
    // constant with 5% residual variation) — the realistic drift shape: a
    // new ingest source whose vectors crowd one region. The frozen
    // codebook's sub-centroids sit in the old isotropic cloud, so every
    // blob slice snaps to the same nearest sub-centroid: codes COLLAPSE
    // and ADC cannot rank inside the blob
    def blobify(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      transform(c, x => x * lit(0.05f) + lit(1.0f))
    val drifted = emb.filter(col("vec_id") >= 100 && col("vec_id") < 300)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        blobify(col("embedding")).as("embedding"))
    Similarity.appendIvfPqIndex(drifted, dir, idx0)
    // queries live in the drifted region too (fresh vectors, not appended)
    val queries = emb.filter(col("vec_id") >= 300 && col("vec_id") < 310)
      .select(col("vec_id"), blobify(col("embedding")).as("embedding"))
    val exact = Similarity.bruteForceTopK(base.unionByName(drifted), queries, k = 5)
    // nprobe = nlist takes list SELECTION out of the measurement (these
    // synthetic embeddings are near-isotropic, so partition recall is a
    // property of the data, not the training); the small rerank makes
    // the score a pure function of ADC CODE QUALITY on the drifted
    // region — exactly what the frozen codebook lost and the retrain
    // must recover
    def avgRecall(idx: Similarity.IvfPqIndex): Double = {
      val approx = Similarity.ivfPqTopKFromIndex(spark, dir, idx, queries,
        k = 5, nprobe = 8, rerank = 50)
      val r = Similarity.recallAtK(exact, approx, 5).collect().map(_.getDouble(1))
      r.sum / r.length
    }
    val before = avgRecall(idx0)
    val idx1 = Similarity.reindexIvfPq(spark, dir, nlist = 8, kmeansIters = 3,
      m = 8, ksub = 32, pqIters = 3)
    val after = avgRecall(idx1)
    println(s"reindex recall@5 on drifted queries: before $before -> after $after")
    assert(after > before,
      s"retrain must improve recall on the drifted region: $before -> $after")
    assert(after >= 0.8, s"post-reindex recall@5 $after")
    // the version superseded by the reindex is retained one rewrite
    // cycle for in-flight readers (same discipline as the dedup store)
    assert(new java.io.File(s"$dir/v=1").isDirectory,
      "pre-reindex version dir retained until the next rewrite")
    graft.Caches.releaseAll(spark)
  }

  test("IVF centroid assignment is a narrow plan: no Window, no Exchange") {
    val embD = emb.select(col("vec_id").as("corpus_id"),
      transform(col("embedding"), x => x.cast("double")).as("cvec"))
    val seed = embD.orderBy("corpus_id").limit(4).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val assigned = embD.select(col("corpus_id"),
      Similarity.nearestCentroid(col("cvec"), seed).as("centroid_id"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"argmax must not be a window sort:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must be shuffle-free:\n$plan")
    assert(assigned.select(countDistinct("centroid_id")).collect()(0).getLong(0) <= 4)
  }
}
