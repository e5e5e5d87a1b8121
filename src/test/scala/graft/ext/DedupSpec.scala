package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river delta"), // near dup
    (4L, "completely different text about apples bananas and oranges today"),
    (5L, "another unrelated document mentioning spark catalyst optimizers")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id winner per content hash") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 4)
    val dupGroup = groups.find(_.getAs[Long]("n_docs") == 2).get
    assert(dupGroup.getAs[Long]("canonical_id") == 1L)
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("shingles produce distinct word n-grams") {
    val s = Seq("a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s"))
      .head.getSeq[String](0)
    assert(s == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).head.getSeq[String](0)
    assert(short == Seq("a b"))
    // staged JVM loop is bit-identical to the Column form on real text
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val colForm = real.select(col("doc_id"), Dedup.shingles(col("text"), 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val udfForm = Dedup.withShingleArray(real, "text", "s", 5)
      .select("doc_id", "s")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(colForm == udfForm)
  }

  test("ngram jaccard finds near-dup pair and not unrelated pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect()
    val ids = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // 1-2 identical (j=1.0); 1-3 and 2-3 are near dups (j=0.833);
    // no pair involves the unrelated docs 4/5
    assert(ids == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val j12 = pairs.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
      .get.getAs[Double]("jaccard")
    assert(j12 == 1.0)
  }

  test("ngram jaccard with lower threshold catches 1-3/2-3") {
    val ids = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minhash signature is deterministic and identical for identical text") {
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 32).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    assert(sigs(1L).length == 32)
    // near-dup texts agree on most hash positions
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree > 16, s"agreement $agree/32")
  }

  test("tight-loop UDF signatures are bit-identical to the Column forms") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val mh = Dedup.withMinhashSignature(real, "text", "sig_udf", n = 3, numHashes = 32)
      .select(col("doc_id"), col("sig_udf"),
        Dedup.minhashSignature(col("text"), 3, 32).as("sig_col"))
      .collect()
    assert(mh.nonEmpty)
    for (r <- mh)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    val sh = Dedup.withSimhash(real, "text", "sh_udf")
      .select(col("doc_id"), col("sh_udf"), Dedup.simhash(col("text")).as("sh_col"))
      .collect()
    for (r <- sh)
      assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}")
  }

  test("minhash LSH surfaces exact + near dup pairs") {
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical texts equal, near texts close, distinct far") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
    val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash128: low half bit-identical to 64-bit sig, halves independent, pairs surface") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    // the 128-bit signature's LOW half votes on the same seed-42 hashes
    // as the 64-bit form — callers can migrate widths without rehashing
    // history, and the parity pins both loops to the same tokenization
    val rows = Dedup.withSimhash128(real, "text", "sig128")
      .select(col("doc_id"), col("sig128"))
      .join(Dedup.withSimhash(real, "text", "sig64")
        .select(col("doc_id"), col("sig64")), Seq("doc_id"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val s128 = r.getSeq[Long](1)
      assert(s128.length == 2)
      assert(s128.head == r.getLong(2), s"doc ${r.getLong(0)}: lo half != 64-bit sig")
    }
    // hi half is an independent projection: across real docs it must not
    // simply mirror lo (a copy would add zero discriminating bits)
    assert(rows.count(r => r.getSeq[Long](1)(1) != r.getSeq[Long](1).head) > 90)
    // operator end-to-end: planted identical pair at dist 0, far docs absent
    val pairs = Dedup.simhash128DupPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Int]("dist")).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
    graft.Caches.releaseAll(spark)
  }

  test("fuzzy pairs: levenshtein within bound, blocked on first token") {
    val titles = Seq(
      (1L, "berlin city guide"),
      (2L, "berlin city guides"),    // dist 1 from 1
      (3L, "berlin town guide"),     // dist 3 from 1
      (4L, "hamburg city guide"),    // different block
      (5L, "berlin")                 // same block, far length band
    ).toDF("doc_id", "title")
    val got = Dedup.fuzzyPairs(titles, "doc_id", "title", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map((1L, 2L) -> 1))
    val loose = Dedup.fuzzyPairs(titles, "doc_id", "title", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,3) is distance 5 (city->town + trailing s): still excluded
    assert(loose == Set((1L, 2L), (1L, 3L)))
  }

  test("fuzzy pairs: degenerate blocking cells dropped by maxBlockSize") {
    // one stop-word cell ("the", same length band) with 6 members, one
    // healthy cell with 2: cap=5 must kill every the-cell pair (including
    // true near-dups) and keep the healthy pair — the documented
    // recall-for-boundedness tradeoff
    val rows = (1L to 6L).map(i => (i, s"the common title nr $i")) ++ Seq(
      (7L, "unique title seven ok"),
      (8L, "unique title seven oke"))
    val titles = rows.toDF("doc_id", "title")
    val capped = Dedup.fuzzyPairs(titles, "doc_id", "title",
        maxDist = 2, maxBlockSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((7L, 8L)))
    // headroom above the cell size -> the same true pairs come back
    val uncapped = Dedup.fuzzyPairs(titles, "doc_id", "title",
        maxDist = 2, maxBlockSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((7L, 8L)) && uncapped.size > 1)
  }

  test("embedding near-dup pairs via hyperplane buckets") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)),   // near dup of 1
      (3L, Array(-1.0f, 0.2f, 0.3f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("doc_id", "vec")
    val pairs = Dedup.embeddingDupPairs(vecs, "doc_id", "vec", threshold = 0.95, planes = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
    // brute-force fallback agrees
    val bf = Dedup.embeddingDupPairs(vecs, "doc_id", "vec", threshold = 0.95, planes = 0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(bf == Set((1L, 2L)))
  }

  test("dedup operators run on the real documents table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val g = Dedup.exactGroups(real, "doc_id", "text")
    assert(g.count() > 0)
    val mh = Dedup.minhashDupPairs(real.limit(200), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, threshold = 0.7)
    mh.count() // just exercises the full plan
  }

  test("connected components: chains collapse to min id, singletons stay") {
    // 1-2-3 a chain (no direct 1-3 edge), 4 isolated, 5-6 a pair
    val nodes = (1L to 6L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    graft.Caches.releaseAll(spark)
  }

  test("connected components: long chain needs diameter rounds and converges") {
    // a 15-node path: label 1 must walk the whole diameter
    val n = 15L
    val nodes = (1L to n).toDF("doc_id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, edges, maxIters = 20)
      .collect().map(r => r.getLong(1)).toSet
    assert(got == Set(1L), "every node labeled with the chain's min id")
    // and the guard really throws when rounds are insufficient
    intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, edges, maxIters = 3).collect()
    }
    graft.Caches.releaseAll(spark)
  }

  test("incremental dedup: new batch checked against the store, then appended") {
    val store = graft.Caches.newTempDir("graft_sigstore_spec").toString
    val gen1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different second document about spark jobs")
    ).toDF("doc_id", "text")
    Dedup.appendSignatureStore(gen1, "doc_id", "text", store)
    // batch: a copy of doc 1, a fresh doc, and two identical new docs
    val gen2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "completely novel content that matches nothing prior"),
      (12L, "twin texts inside one single incoming batch here"),
      (13L, "twin texts inside one single incoming batch here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.dedupAgainstStore(spark, store, gen2, "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (12L, 13L)),
      s"cross-store dup AND batch-internal twin: $pairs")
    // append gen2; a later copy of a gen2 doc is now caught too
    Dedup.appendSignatureStore(gen2, "doc_id", "text", store)
    val gen3 = Seq((20L, "completely novel content that matches nothing prior"))
      .toDF("doc_id", "text")
    val pairs3 = Dedup.dedupAgainstStore(spark, store, gen3, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs3 == Set((11L, 20L)))
    graft.Caches.releaseAll(spark)
  }

  test("stats table merged across appends equals a full bucket recount") {
    val store = graft.Caches.newTempDir("graft_sigstore_stats").toString
    def gen(base: Long, n: Int) = spark.range(base, base + n)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 9).map(j =>
          concat(lit(s"s${j}t"), pmod(col("id") * 13 + j, lit(4999)))): _*).as("text"))
    Dedup.appendSignatureStore(gen(0, 40), "doc_id", "text", store, storeParts = 4)
    Dedup.appendSignatureStore(gen(5000, 25), "doc_id", "text", store, storeParts = 4)
    Dedup.appendSignatureStore(gen(9000, 10), "doc_id", "text", store, storeParts = 4)
    // the live manifest plus TWO retained predecessors (the compaction
    // sweep honors all of them — two-generation reader headroom); older
    // ones are deleted at commit
    val manifests = new java.io.File(s"$store/stats").listFiles()
      .filter(_.getName.startsWith("manifest-")).map(_.getName).sorted
    assert(manifests.toSeq == Seq("manifest-1", "manifest-2", "manifest-3"),
      s"live manifest + two retained predecessors: ${manifests.toSeq}")
    // the union of manifest-routed live partitions == ground-truth recount
    val (mv, segs, manifest) = Dedup.readStatsManifest(spark, store)
    assert(mv == 3 && segs.size == 3 && manifest.nonEmpty)
    val stats = manifest.toSeq
      .map { case ((b, m), v) => spark.read
        .option("basePath", s"$store/stats/v=$v")
        .parquet(s"$store/stats/v=$v/band=$b/hmod=$m") }
      .reduce(_ unionByName _)
      .select("band", "band_hash", "cnt").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val recount = segs.map(s => spark.read.parquet(s"$store/buckets/seg-$s"))
      .reduce(_ unionByName _)
      .groupBy("band", "band_hash").count().collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(stats == recount, "incrementally-merged stats == ground-truth recount")
    assert(stats.values.sum == 75L * 16, "one bucket row per (doc, band)")
    graft.Caches.releaseAll(spark)
  }

  test("append rewrites only batch-touched stats partitions (O(batch keys), not O(store))") {
    val store = graft.Caches.newTempDir("graft_sigstore_plocal").toString
    // first append: 400 docs spread over all 16 bands x 16 hmods = 256
    // stats partitions (uniform hashing, 6400 bucket rows)
    val corpus = spark.range(400).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit(s"p${j}y"), pmod(col("id") * 37 + j, lit(99991)))): _*).as("text"))
    Dedup.appendSignatureStore(corpus, "doc_id", "text", store)
    def partsIn(v: Int): Set[(Int, Int)] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) :+ d else Seq.empty
      walk(new java.io.File(s"$store/stats/v=$v")).filter(_.isDirectory)
        .filter(_.getName.startsWith("hmod="))
        .map(f => (f.getParentFile.getName.drop(5).toInt, f.getName.drop(5).toInt))
        .toSet
    }
    // stats version dirs are keyed on the writing append's CLAIMED
    // segment id: first append on a fresh store claims seg 0
    val v1Parts = partsIn(0)
    assert(v1Parts.size > 200, s"first append touches ~all 256 partitions: ${v1Parts.size}")
    // second append: ONE doc -> exactly its 16 (band, hmod) keys
    val one = spark.range(1).select((col("id") + 5000000L).as("doc_id"),
      lit("a lone second-append document with fresh tokens only").as("text"))
    Dedup.appendSignatureStore(one, "doc_id", "text", store)
    val v2Parts = partsIn(1)
    assert(v2Parts.size <= 16,
      s"the append's stats WRITE must touch only the batch's <= bands keys, got ${v2Parts.size}")
    // untouched partitions were NOT rewritten: their v=0 dirs survive and
    // the manifest still routes them to v=0
    val (mv, _, manifest) = Dedup.readStatsManifest(spark, store)
    assert(mv == 2)
    val untouched = v1Parts -- v2Parts
    assert(untouched.nonEmpty && untouched.forall(manifest(_) == 0),
      "untouched keys carry forward by manifest reference, no rewrite")
    assert(v2Parts.forall(manifest(_) == 1), "touched keys re-routed to the new version")
    // touched keys' superseded v=0 partitions are RETAINED (unreferenced
    // by the live manifest, referenced by its retained predecessor) so a
    // probe that resolved them pre-append still finds them; compaction
    // sweeps them once no retained manifest references them
    assert(v2Parts.subsetOf(partsIn(0)),
      "superseded v=0 dirs are retained for in-flight readers after the manifest commit")
    // probe correctness across the two-version layout: a copy of a
    // first-append doc AND of the second-append doc both surface
    val batch = corpus.filter(col("doc_id") === 3L)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
      .unionByName(one.select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val pairs = Dedup.dedupAgainstStore(spark, store, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 900003L), (5000000L, 5900000L)), s"got $pairs")
    graft.Caches.releaseAll(spark)
  }

  test("stats dirs without a manifest fail fast instead of reading as zero counts") {
    val store = graft.Caches.newTempDir("graft_sigstore_noman").toString
    val docs = Seq((1L, "a document whose stats will lose their manifest"))
      .toDF("doc_id", "text")
    Dedup.appendSignatureStore(docs, "doc_id", "text", store)
    // simulate a pre-manifest-layout store / a crashed first append:
    // version dirs present, manifest gone
    new java.io.File(s"$store/stats").listFiles()
      .filter(_.getName.startsWith("manifest-")).foreach(f => assert(f.delete()))
    val probe = Seq((2L, "probe text")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.dedupAgainstStore(spark, store, probe, "doc_id", "text").count()
    }
    assert(e.getMessage.contains("no manifest"))
    intercept[IllegalStateException] {
      Dedup.appendSignatureStore(probe, "doc_id", "text", store)
    }
    graft.Caches.releaseAll(spark)
  }

  test("store is single-writer: a held lock makes append/compaction fail fast") {
    val store = graft.Caches.newTempDir("graft_sigstore_lock").toString
    val docs = Seq((1L, "some document text for the lock test")).toDF("doc_id", "text")
    Dedup.appendSignatureStore(docs, "doc_id", "text", store)
    // simulate a concurrent writer (or a crashed one's stale lock)
    val lock = new java.io.File(s"$store/_lock")
    assert(lock.createNewFile(), "lock must be free after a clean append")
    val e1 = intercept[IllegalStateException] {
      Dedup.appendSignatureStore(
        Seq((2L, "second doc")).toDF("doc_id", "text"), "doc_id", "text", store)
    }
    assert(e1.getMessage.contains("SINGLE-WRITER"))
    intercept[IllegalStateException] { Dedup.compactSignatureStore(spark, store) }
    assert(lock.delete())
    // and the store works again once the lock is released
    Dedup.appendSignatureStore(
      Seq((2L, "an unrelated second document")).toDF("doc_id", "text"),
      "doc_id", "text", store)
    graft.Caches.releaseAll(spark)
  }

  test("racing appenders: losers fail loud pre-publish, store equals the committed appends alone") {
    // the recorded decision (appendSignatureStore scaladoc): two
    // GENUINELY CONCURRENT appends — not a pre-held lock — must never
    // produce an interleaved half-merge. Legal schedules on a
    // non-atomic-create filesystem: one fails at the lock; both slip
    // past the lock and exactly one wins the conditional manifest
    // rename; or (vanishingly rare) they fully serialize and both
    // commit cleanly. In EVERY schedule the store's readable state is
    // exactly the seed plus the successful appends — a loser's claimed
    // segment dirs are unreferenced names no reader resolves.
    val store = graft.Caches.newTempDir("graft_sigstore_race").toString
    Dedup.appendSignatureStore(
      Seq((1L, "seed document establishing the store"))
        .toDF("doc_id", "text"), "doc_id", "text", store)
    def liveState: (Set[Long], Long) = {
      val (_, segs, manifest) = Dedup.readStatsManifest(spark, store)
      val ids = segs.map(s => spark.read.parquet(s"$store/sigs/seg-$s"))
        .reduceOption(_ unionByName _)
        .map(_.select("doc_id").collect().map(_.getLong(0)).toSet)
        .getOrElse(Set.empty[Long])
      val statsTotal = manifest.toSeq
        .map { case ((b, m), v) => spark.read
          .option("basePath", s"$store/stats/v=$v")
          .parquet(s"$store/stats/v=$v/band=$b/hmod=$m") }
        .reduceOption(_ unionByName _)
        .map(_.agg(sum("cnt")).first().getLong(0)).getOrElse(0L)
      (ids, statsTotal)
    }
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        val docs = Seq((100L + i, s"racing batch $i payload text"))
          .toDF("doc_id", "text")
        barrier.await()
        try Dedup.appendSignatureStore(docs, "doc_id", "text", store)
        catch { case t: Throwable => results.put(i, t): Unit }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    // every loser failed LOUD on the single-writer contract — at the
    // lock, or past it at the first-committer-wins manifest claim —
    // never with a partial write into a live dir
    results.values.forEach { t =>
      assert(t.isInstanceOf[IllegalStateException] &&
        t.getMessage.contains("SINGLE-WRITER"),
        s"losers must fail loud on the single-writer contract, got $t")
    }
    val winners = (0 until 2).filterNot(results.containsKey(_))
      .map(100L + _).toSet
    val (ids, statsTotal) = liveState
    assert(ids == Set(1L) ++ winners,
      s"store must hold exactly the seed + committed docs, got $ids")
    // no half-merge: the manifest-routed stats equal a full recount of
    // the live docs (16 bands × one bucket row per doc)
    assert(statsTotal == 16L * ids.size,
      s"stats must recount the committed docs exactly: $statsTotal")
    // a winner always releases the lock; when every racer aborted the
    // lock can be stale by construction — apply the documented operator
    // recovery (no writer is live: remove it)
    val lockFile = new java.io.File(s"$store/_lock")
    if (lockFile.exists()) {
      assert(winners.isEmpty, "a completed winner must release the lock")
      assert(lockFile.delete())
    }
    // every loser's clean retry lands normally
    (0 until 2).filter(results.containsKey(_)).foreach { i =>
      Dedup.appendSignatureStore(
        Seq((100L + i, s"retried batch $i payload"))
          .toDF("doc_id", "text"), "doc_id", "text", store)
    }
    assert(liveState._1 == Set(1L, 100L, 101L))
    graft.Caches.releaseAll(spark)
  }

  test("store parameters are pinned: mismatched probe/append require()s, not silent loss") {
    val store = graft.Caches.newTempDir("graft_sigstore_meta").toString
    val docs = Seq((1L, "document text pinning the store parameters")).toDF("doc_id", "text")
    Dedup.appendSignatureStore(docs, "doc_id", "text", store) // defaults: 3/64/16/16
    val probe = Seq((2L, "probe text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstStore(spark, store, probe, "doc_id", "text", storeParts = 8)
        .count()
    }
    assert(e.getMessage.contains("meta.json"))
    intercept[IllegalArgumentException] {
      Dedup.appendSignatureStore(probe, "doc_id", "text", store, bands = 8)
    }
    // matching params still work
    assert(Dedup.dedupAgainstStore(spark, store, probe, "doc_id", "text").count() == 0)
    graft.Caches.releaseAll(spark)
  }

  test("reader-safe compaction: reads planned against pre-compaction metadata stay complete") {
    val store = graft.Caches.newTempDir("graft_sigstore_race").toString
    def gen(base: Long) = spark.range(base, base + 50).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit(s"r${j}q"), pmod(col("id") * 23 + j, lit(7919)))): _*).as("text"))
    Dedup.appendSignatureStore(gen(0), "doc_id", "text", store, storeParts = 4)
    Dedup.appendSignatureStore(gen(2000), "doc_id", "text", store, storeParts = 4)
    // PLAN a probe's store reads exactly the way dedupAgainstStore does:
    // resolve the manifest (segment list + stats routing), then CREATE
    // the DataFrames — Spark lists the concrete files here, so this is
    // the reader state a compaction firing next could invalidate
    val (_, segs, manifest) = Dedup.readStatsManifest(spark, store)
    assert(segs.nonEmpty && manifest.nonEmpty)
    val plannedBuckets = segs
      .map(s => spark.read.parquet(s"$store/buckets/seg-$s"))
      .reduce(_ unionByName _)
    val plannedStats = manifest.toSeq.map { case ((b, m), v) =>
      spark.read.option("basePath", s"$store/stats/v=$v")
        .parquet(s"$store/stats/v=$v/band=$b/hmod=$m") }
      .reduce(_ unionByName _)
    // compaction fires BETWEEN the metadata read and the data read — the
    // exact interleaving the pre-r7 swap-aside + immediate sweep broke;
    // zero grace so retention rests purely on manifest references
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    assert(plannedBuckets.count() == 100L * 16,
      "bucket read planned pre-compaction must be complete, never partial")
    assert(plannedStats.agg(sum("cnt")).first().getLong(0) == 100L * 16,
      "stats read planned pre-compaction must see every routed partition")
    // and a probe planned AFTER the compaction sees the same world
    val batch = gen(0).limit(2)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
    val pairs = Dedup.dedupAgainstStore(spark, store, batch, "doc_id", "text",
        storeParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 800000L), (1L, 800001L)), s"got $pairs")
    graft.Caches.releaseAll(spark)
  }

  test("probe survives TWO writer generations between plan and execution") {
    val store = graft.Caches.newTempDir("graft_sigstore_race2").toString
    def gen(base: Long) = spark.range(base, base + 50).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit(s"g${j}x"), pmod(col("id") * 31 + j, lit(7919)))): _*).as("text"))
    Dedup.appendSignatureStore(gen(0), "doc_id", "text", store, storeParts = 4)
    Dedup.appendSignatureStore(gen(2000), "doc_id", "text", store, storeParts = 4)
    // reader state a probe resolves: manifest segment list + routed stats
    val (_, segs, manifest) = Dedup.readStatsManifest(spark, store)
    val plannedBuckets = segs
      .map(s => spark.read.parquet(s"$store/buckets/seg-$s"))
      .reduce(_ unionByName _)
    val plannedStats = manifest.toSeq.map { case ((b, m), v) =>
      spark.read.option("basePath", s"$store/stats/v=$v")
        .parquet(s"$store/stats/v=$v/band=$b/hmod=$m") }
      .reduce(_ unionByName _)
    // a full probe planned now too — its signature re-attach executes
    // lazily, against the dirs resolved here
    val batch = gen(0).limit(2)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
    val plannedProbe = Dedup.dedupAgainstStore(spark, store, batch,
      "doc_id", "text", storeParts = 4)
    // GENERATION 1: an append that touches (and thus dereferences) the
    // planned manifest entries; GENERATION 2: its successor compaction —
    // whose sweep honors every RETAINED manifest generation, so the
    // dirs plannedStats points at survive (pre-r9 it consulted only the
    // post-append manifest and deleted exactly those dirs)
    Dedup.appendSignatureStore(gen(4000), "doc_id", "text", store, storeParts = 4)
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    assert(plannedBuckets.filter(col("doc_id") < 4000)
      .select("doc_id").distinct().count() == 100,
      "bucket read planned two generations ago must still cover every doc")
    assert(plannedStats.agg(sum("cnt")).first().getLong(0) == 100L * 16,
      "stats dirs referenced by the pre-append manifest must survive the " +
        "append's successor compaction")
    val pairs = plannedProbe.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 800000L), (1L, 800001L)), s"got $pairs")
    // segment flavor: a probe planned after that compaction must
    // survive TWO further compactions (superseded segments stay
    // referenced by the two retained predecessor manifests; pre-r9 the
    // second compaction swept the probe's resolved dirs)
    val plannedProbe2 = Dedup.dedupAgainstStore(spark, store, batch,
      "doc_id", "text", storeParts = 4)
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    val pairs2 = plannedProbe2.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 == Set((0L, 800000L), (1L, 800001L)), s"got $pairs2")
    graft.Caches.releaseAll(spark)
  }

  test("probing an empty or absent store yields batch-internal pairs only") {
    val store = graft.Caches.newTempDir("graft_sigstore_empty").toString  // never appended
    val batch = Seq(
      (1L, "twin texts inside one single incoming batch here"),
      (2L, "twin texts inside one single incoming batch here"),
      (3L, "completely different third text")).toDF("doc_id", "text")
    val pairs = Dedup.dedupAgainstStore(spark, store, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"only the batch twins: $pairs")
    graft.Caches.releaseAll(spark)
  }

  test("signature-store compaction: one file per partition, probe results identical") {
    val store = graft.Caches.newTempDir("graft_sigstore_compact").toString
    def gen(base: Long) = spark.range(base, base + 60).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit(s"c${j}w"), pmod(col("id") * 17 + j, lit(7919)))): _*).as("text"))
    (0 until 3).foreach(k => Dedup.appendSignatureStore(gen(k * 1000), "doc_id", "text",
      store, storeParts = 4))
    val batch = gen(0).limit(3)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    def probe() = Dedup.dedupAgainstStore(spark, store, batch, "doc_id", "text",
        storeParts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe()
    assert(before.nonEmpty, "planted copies must match their originals")
    def liveSegs: Seq[Int] = Dedup.readStatsManifest(spark, store)._2
    def maxFilesPerDir(sub: String): Int = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) :+ d else Seq.empty
      liveSegs.map { s =>
        walk(new java.io.File(s"$store/$sub/seg-$s")).filter(_.isDirectory)
          .map(_.listFiles().count(f => f.getName.endsWith(".parquet"))).max
      }.max
    }
    assert(liveSegs.size == 3, "three appends -> three live segments")
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    assert(liveSegs.size == 1, "compacted to one packed segment")
    assert(maxFilesPerDir("buckets") == 1, "compacted to one file per partition")
    assert(maxFilesPerDir("sigs") == 1)
    assert(probe() == before, "probe unchanged by compaction")
    // superseded segments stay referenced by the two retained
    // predecessor manifests, then are swept — deferred deletion is
    // bounded, not a leak
    assert(new java.io.File(s"$store/buckets/seg-0").isDirectory,
      "superseded segment retained for in-flight readers")
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    assert(new java.io.File(s"$store/buckets/seg-0").isDirectory,
      "second compaction still retains the two-generations-old segment")
    Dedup.compactSignatureStore(spark, store, orphanGraceMs = 0L)
    assert(!new java.io.File(s"$store/buckets/seg-0").exists(),
      "third compaction sweeps the segment past its retained-manifest window")
    assert(probe() == before, "probe unchanged by repeated compaction")
    graft.Caches.releaseAll(spark)
  }

  test("incremental probe reads only batch-keyed store partitions (O(batch), not O(store))") {
    val store = graft.Caches.newTempDir("graft_sigstore_obs").toString
    // a store of 400 distinct docs: 400 × 16 bands = 6400 bucket rows
    // spread over 16 bands × 16 hmods = 256 disk partitions
    val corpus = spark.range(400).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit(s"w${j}x"), pmod(col("id") * 31 + j, lit(99991)))): _*).as("text"))
    Dedup.appendSignatureStore(corpus, "doc_id", "text", store)
    val storeBucketRows = spark.read.parquet(s"$store/buckets/seg-0").count()
    assert(storeBucketRows == 400L * 16)
    // a ONE-doc batch touches ≤ 16 (band, hmod) partitions of the 256 —
    // the observed store-side scan must read only those slices, i.e.
    // ~1/16th of the store, NOT all 6400 rows
    val batchText = corpus.filter(col("doc_id") === 7L)
      .select("text").collect().head.getString(0)
    val batch = Seq((9999L, batchText)).toDF("doc_id", "text")
    val probeRows = new java.util.concurrent.atomic.AtomicLong(-1L)
    val out = Dedup.dedupAgainstStore(spark, store, batch, "doc_id", "text",
        probeRowsRead = Some(probeRows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((7L, 9999L)), s"planted copy must surface: $out")
    val read = probeRows.get()
    // uniform hashing ⇒ ~25 rows per touched partition × ≤16 partitions
    // ≈ 400 rows; assert a hard bound well under the full store
    assert(read > 0 && read <= storeBucketRows / 4,
      s"probe read $read of $storeBucketRows store bucket rows — pruning lost")
    graft.Caches.releaseAll(spark)
  }

  test("substring-span dedup: canonical kept, later occurrences cut, overlap unions") {
    val docs = Seq(
      (1L, "a b c d e f g h x"),                  // canonical "a..h" + unique tail
      (2L, "z z a b c d e f g h"),                // same 8-gram at pos 2 -> cut, keep "z z"
      (3L, "a b c d e f g h a b c d e f g h"),    // two occurrences -> fully cut
      (4L, "totally unrelated short words here")  // no dup windows, unchanged
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((9L, 0L, "a b c d e f g h x")),
      s"canonical occurrence untouched: ${got(1L)}")
    assert(got(2L) == ((10L, 8L, "z z")), s"later occurrence cut: ${got(2L)}")
    assert(got(3L) == ((16L, 16L, "")), s"doubly-repeated doc fully cut: ${got(3L)}")
    assert(got(4L) == ((5L, 0L, "totally unrelated short words here")))
    graft.Caches.releaseAll(spark)
  }

  test("containment catches an excerpt that Jaccard misses") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")   // 58 3-gram shingles
    val excerpt = (1 to 8).map(i => s"w$i").mkString(" ") // 6 shingles, all in big
    val df = Seq((1L, big), (2L, excerpt), (3L, "other unrelated words here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(cont.keySet == Set((1L, 2L)), s"got ${cont.keySet}")
    val (ab, ba) = cont((1L, 2L))
    assert(ba == 1.0, "the excerpt is fully contained in the big doc")
    assert(ab < 0.2, "the big doc is NOT contained in the excerpt")
    // symmetric Jaccard on the same pair is far below any dedup threshold
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.0)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .head().getAs[Double]("jaccard")
    assert(jac < 0.15, s"jaccard under-scores the excerpt relation: $jac")
  }

  test("semantic dedup: near-identical vectors pair within their cluster") {
    // two tight groups on opposite axes + a loner; k-means with 2 clusters
    // must separate the groups, and only within-group pairs verify
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.05)),
      (2L, Array(0.99, 0.01, 0.0, 0.05)),    // semantic dup of 1
      (3L, Array(0.0, 1.0, 0.05, 0.0)),
      (4L, Array(0.01, 0.99, 0.05, 0.0)),    // semantic dup of 3
      (5L, Array(-1.0, -1.0, 0.5, 0.0))
    ).toDF("doc_id", "vec")
    val pairs = Dedup.semanticDupPairs(vecs, "doc_id", "vec",
      nClusters = 2, kmeansIters = 2, threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
    graft.Caches.releaseAll(spark)
  }

  test("semantic dedup: degenerate clusters dropped by maxClusterSize") {
    // 30 copies of one vector (a degenerate cluster) + one genuine pair
    // elsewhere: with the cap at 10 the big cluster contributes NO pairs,
    // while the small cluster's pair survives
    val big = (100L to 129L).map(i => (i, Array(1.0, 0.0, 0.0, 0.0)))
    val small = Seq(
      (1L, Array(0.0, 1.0, 0.0, 0.1)),
      (2L, Array(0.0, 0.99, 0.01, 0.1)))
    val vecs = (big ++ small).toDF("doc_id", "vec")
    val pairs = Dedup.semanticDupPairs(vecs, "doc_id", "vec",
      nClusters = 2, kmeansIters = 1, threshold = 0.95, maxClusterSize = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    graft.Caches.releaseAll(spark)
  }
}
