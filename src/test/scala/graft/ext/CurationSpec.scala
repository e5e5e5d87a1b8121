package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deterministic sample: same rows every run, frac approximately honored") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Curation.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "identical draw on rerun")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.08, s"got ${a.size / n}")
    // monotone: a smaller fraction draws a subset of a larger one
    val small = Curation.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }

  test("stratified sample honors per-stratum fractions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sampled = Curation.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFrac = 0.5)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == total("en"), "frac 1.0 keeps everything")
    assert(!byLang.contains("de"), "frac 0.0 keeps nothing")
  }

  test("distributed global cumsum equals the single-window cumsum") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextStats.wsTokenCount(col("text")).as("v"))
    val dist = Curation.withGlobalCumsum(docs, "doc_id", "v", "cum", numPartitions = 7)
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val win = docs.withColumn("cum",
      sum(col("v").cast("long")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dist == win)
  }

  test("token packing: contiguous offsets, correct bin spans, straddlers flagged") {
    val df = Seq((1L, 3000), (2L, 2000), (3L, 100), (4L, 5000))
      .toDF("doc_id", "n_tokens")
    val got = Curation.packTokenBins(df, "doc_id", "n_tokens", budget = 4096L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // cum: 3000, 5000, 5100, 10100
    assert(got(0) == ((1L, 0L, 0L, 0L)))        // [0, 3000) in bin 0
    assert(got(1) == ((2L, 3000L, 0L, 1L)))     // straddles 4096
    assert(got(2) == ((3L, 5000L, 1L, 1L)))
    assert(got(3) == ((4L, 5100L, 1L, 2L)))     // straddles 8192
  }

  test("weighted sample: zero weight drops, full weight keeps, monotone in weight") {
    val df = spark.range(0, 2000).select(col("id").as("doc_id"))
    def drawn(w: Double): Set[Long] =
      Curation.weightedSample(df.withColumn("w", lit(w)), "doc_id", "w")
        .collect().map(_.getLong(0)).toSet
    assert(drawn(0.0).isEmpty)
    assert(drawn(1.0).size == 2000)
    val lo = drawn(0.2); val hi = drawn(0.6)
    // same hash buckets, higher threshold: strictly nested draws
    assert(lo.subsetOf(hi))
    assert(lo.size < hi.size && hi.size < 2000)
  }

  test("HTML stripping: tags/scripts out, entities decoded, whitespace collapsed") {
    val rows = Seq(
      (1L, "<html><body><p>Hello <b>world</b></p></body></html>"),
      (2L, "before<script type=\"x\">var a = '<p>';</script>after"),
      (3L, "<style>p { color: red }</style>styled"),
      (4L, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;"),
      (5L, "no markup at all"),
      // double-escaped entities decode ONE level (never into live markup:
      // &amp; is decoded last, after &lt;/&gt;)
      (6L, "use &amp;lt;b&amp;gt; for bold")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), Curation.stripHtml(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Hello world")
    assert(got(2L) == "before after")
    assert(got(3L) == "styled")
    assert(got(4L) == "a & b <tag> \"q\" 's'")
    assert(got(5L) == "no markup at all")
    assert(got(6L) == "use &lt;b&gt; for bold")
  }

  test("C4 line filter: terminal punctuation + min words, doc-level minimum") {
    val good = "This line has enough words and ends well.\n" +
      "Another proper sentence with plenty of words here!\n" +
      "A third qualifying line is also present, yes?\n" +
      "menu item\n" +               // too short, no terminal punct
      "Click here\n" +              // boilerplate: no terminal punct
      "Short one."                  // terminal punct but < 5 words
    val rows = Seq(
      (1L, good),
      (2L, "Only one good line survives in this document.\nnav\nfooter"))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        Curation.c4LineFilter(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).get.split("\n").length == 3)
    assert(got(1L).get.split("\n").forall(_.matches(".*[.!?]$")))
    // fewer than minLines survivors -> whole doc dropped (null)
    assert(got(2L).isEmpty)
  }

  test("PII redaction: emails, IPs, phones replaced; clean text untouched") {
    val rows = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.co.uk today"),
      (2L, "server at 10.0.255.3 responded"),
      (3L, "call +1 (555) 010-7788 or 555-010-9999 now"),
      (4L, "version 1.2 costs $3.50 on May 4"),     // decimals/dates survive
      (5L, "a@b.io and 8.8.8.8 and 12345678901"))   // all three in one row
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), Curation.redactPii(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail me at <EMAIL> today")
    assert(got(2L) == "server at <IP> responded")
    assert(got(3L) == "call <PHONE> or <PHONE> now")
    assert(got(4L) == "version 1.2 costs $3.50 on May 4")
    assert(got(5L) == "<EMAIL> and <IP> and <PHONE>")
  }

  test("per-key cap keeps the lowest-order n rows of each key") {
    val df = (1L to 100L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val capped = Curation.capPerKey(df, "source", n = 5, orderCol = "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(capped.length == 15)
    val byKey = capped.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byKey("src0") == Seq(3L, 6L, 9L, 12L, 15L))
    assert(byKey("src1") == Seq(1L, 4L, 7L, 10L, 13L))
    assert(byKey("src2") == Seq(2L, 5L, 8L, 11L, 14L))
  }

  test("decontamination: docs sharing an eval n-gram flagged, rest kept") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains bench gram
      (2L, "one two three four five six"),           // clean
      (3L, "the quick brown fox jumps high"),        // contains bench gram
      (4L, "short text")                             // < n tokens, clean
    ).toDF("doc_id", "text")
    val bench = Seq(
      "alpha beta gamma delta epsilon",              // 5-gram of doc 1
      "lazy dogs avoid the quick brown fox jumps today" // overlaps doc 3
    ).toDF("text")
    val hits = Curation.contaminationHits(docs, "doc_id", "text", bench, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L, 3L), s"got $hits")
    // doc 1 shares two 5-grams with the bench text ("alpha..epsilon" is a
    // 6-token doc: grams at offsets 0,1; only offset 0 is in the 5-token
    // bench line which yields exactly one gram)
    assert(hits(1L) == 1L)
    assert(hits(3L) == 1L) // "the quick brown fox jumps"
    val kept = Curation.decontaminate(docs, "doc_id", "text", bench, "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("decontamination: short bench line matches whole-text shingle only") {
    // a bench line shorter than n becomes ONE whole-line shingle; it only
    // flags a doc whose own whole-short-text shingle is identical
    val docs = Seq((1L, "tiny doc"), (2L, "other words")).toDF("doc_id", "text")
    val bench = Seq("tiny doc").toDF("text")
    val hits = Curation.contaminationHits(docs, "doc_id", "text", bench, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L))
  }

  test("unicode normalize + accent fold: composed == decomposed, fold strips marks") {
    val composed = "Café"                       // é as one code point
    val decomposed = "Café"                    // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed), (3L, "straße"), (4L, null))
      .toDF("id", "t")
    val got = df.select(col("id"),
        Curation.normalizeUnicode(col("t")).as("nfc"),
        Curation.foldAccents(col("t")).as("folded"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L)._1 == composed && got(2L)._1 == composed,
      "NFC canonicalizes both encodings to the composed form")
    assert(got(1L)._2 == "Cafe" && got(2L)._2 == "Cafe",
      "folding is encoding-independent")
    assert(got(3L)._2 == "straße", "non-decomposable chars pass through")
    assert(got(4L) == ((null, null)))
    // idempotence: folding folded text is a fixed point
    val twice = df.filter(col("t").isNotNull).select(
      Curation.foldAccents(Curation.foldAccents(col("t"))) ===
        Curation.foldAccents(col("t"))).collect()
    assert(twice.forall(_.getBoolean(0)))
  }

  test("fuzzy decontamination: paraphrase-level matches exact n-grams miss") {
    import spark.implicits._
    // 30 tokens with edits at positions 8 and 21: the unedited runs are
    // 7, 12, and 9 tokens long, so NO 13-token contiguous window
    // survives (exact 13-gram overlap = zero), while only 6 of 28
    // 3-shingles change (true Jaccard 22/34 ~ 0.65) — exactly the
    // paraphrase band fuzzy decontamination exists for
    val benchText = "the quick brown fox jumps over the lazy dog while rain falls " +
      "on the quiet town square and the old clock tower rings twelve times " +
      "over the sleeping valley tonight"
    val paraphrase = benchText.replace("lazy", "snoozing").replace("clock", "sand")
    val train = Seq(
      (1L, paraphrase),
      (2L, "a completely unrelated training document about distributed query engines and shuffles"),
      (3L, benchText)).toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val hits = Curation.contaminationHitsFuzzy(train, "doc_id", "text",
        bench, "text", threshold = 0.55)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(hits.contains(3L) && hits(3L) == 1.0, s"exact copy at 1.0: $hits")
    assert(hits.contains(1L) && hits(1L) >= 0.55, s"paraphrase flagged: $hits")
    assert(!hits.contains(2L), s"clean doc not flagged: $hits")
    // the exact-n-gram path misses the paraphrase at the default n=13
    val exact = Curation.contaminationHits(train, "doc_id", "text", bench, "text")
      .collect().map(_.getLong(0)).toSet
    assert(!exact.contains(1L), "exact n-gram overlap misses the paraphrase")
    graft.Caches.releaseAll(spark)
  }

  test("temperature sampling flattens the mixture: big keys cut toward the smallest") {
    val rows = (1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))
    val df = rows.toDF("doc_id", "key")
    val kept = Curation.temperatureSample(df, "doc_id", "key", alpha = 0.5)
      .groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100L,
      "rate (n_min/n_min)^(1-a) = 1.0 keeps the whole smallest key")
    // big keeps rate sqrt(100/900) = 1/3 -> ~300 of 900: the 90/10 natural
    // mixture flattens to ~75/25 (post-sample counts ∝ sqrt(n_k))
    val frac = kept("big").toDouble / 900.0
    assert(math.abs(frac - 1.0 / 3.0) < 0.1, s"got $frac")
    // alpha = 1.0 keeps the natural distribution: every key whole
    val nat = Curation.temperatureSample(df, "doc_id", "key", alpha = 1.0)
      .groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat == Map("big" -> 900L, "small" -> 100L))
    // alpha -> 0 flattens toward uniform: big cut to ≈ n_min
    val flat = Curation.temperatureSample(df, "doc_id", "key", alpha = 0.01)
      .groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat("small") == 100L)
    assert(math.abs(flat("big").toDouble - 100.0) < 50.0,
      s"alpha→0 cuts big to ≈ n_min, got ${flat("big")}")
    // deterministic: identical draw on rerun
    val again = Curation.temperatureSample(df, "doc_id", "key", alpha = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Curation.temperatureSample(df, "doc_id", "key", alpha = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("sentence segmentation: terminal-punct splits, indices, empty fragments dropped") {
    val df = Seq(
      (1L, "First one. Second two! Third three? tail"),
      (2L, "No terminal punctuation here"),
      (3L, "Trailing. ")
    ).toDF("doc_id", "text")
    val got = Curation.sentences(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 0, "First one"), (1L, 1, "Second two"), (1L, 2, "Third three"),
      (1L, 3, "tail"),
      (2L, 0, "No terminal punctuation here"),
      (3L, 0, "Trailing")), s"got $got")
  }

  test("token chunking: exact windows, overlap, short and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks: 2 chunks @ size 6/overlap 2
      (2L, "a b c"),                                  // short: one chunk
      (3L, "")                                        // empty: one empty chunk
    ).toDF("doc_id", "text")
      // null text behaves exactly like empty text (one empty chunk)
      .unionByName(Seq(4L).toDF("doc_id").withColumn("text",
        lit(null).cast("string")))
    val got = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 6, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got(0) == ((1L, 0, "w1 w2 w3 w4 w5 w6", 6)))
    assert(got(1) == ((1L, 1, "w5 w6 w7 w8 w9 w10", 6)))
    assert(got(2) == ((2L, 0, "a b c", 3)))
    assert(got(3) == ((3L, 0, "", 0)))
    assert(got(4) == ((4L, 0, "", 0)))
    assert(got.length == 5)
    // overlap = 0 partitions the tokens exactly: concatenation round-trips
    val flat = Curation.chunkTokens(docs.filter(col("doc_id") === 1L),
      "doc_id", "text", chunkSize = 4, overlap = 0)
      .orderBy("chunk_idx").collect().map(_.getString(2)).mkString(" ")
    assert(flat == (1 to 10).map(i => s"w$i").mkString(" "))
  }
}
