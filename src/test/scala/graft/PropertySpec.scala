package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.wiki.{Queries, WikiText}
import graft.ext.{Dedup, TextStats}

/** Property-based invariants (SURVEY.md §5): normalization and counting
  * laws that must hold for ANY input, not just fixtures. Uses ScalaCheck
  * generators with a fixed seed (the scalatest-scalacheck bridge is not in
  * the offline cache; deterministic sampling is preferable for CI anyway).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  test("A3: priors per alias sum to 1 and lie in (0,1] for any count table") {
    import spark.implicits._
    val rowGen = for {
      alias <- Gen.oneOf("a", "b", "c", "d")
      entity <- Gen.oneOf("Q1", "Q2", "Q3")
      count <- Gen.chooseNum(1L, 50L)
    } yield (alias, entity, count)
    val rows = samples(rowGen, 200)
    val df = rows.toDF("alias", "entity_id", "count")
      .groupBy("alias", "entity_id").agg(sum("count").as("count"))
    val priors = Queries.aliasPriorsFlat(df).collect()
    assert(priors.nonEmpty)
    assert(priors.forall { r =>
      val p = r.getAs[Double]("prior"); p > 0.0 && p <= 1.0
    })
    val sums = priors.groupBy(_.getAs[String]("alias"))
      .view.mapValues(_.map(_.getAs[Double]("prior")).sum)
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("T2: capitalizeFirst preserves length and is idempotent") {
    import spark.implicits._
    val texts = samples(text, 100).filter(_.nonEmpty)
    val rows = texts.toDF("t")
      .select(col("t"), WikiText.capitalizeFirst(col("t")).as("c"),
        WikiText.capitalizeFirst(WikiText.capitalizeFirst(col("t"))).as("cc"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1).length == r.getString(0).length))
    assert(rows.forall(r => r.getString(1) == r.getString(2)))
  }

  test("F14: truncateContent output never exceeds the limit and is a prefix") {
    import spark.implicits._
    val texts = samples(text, 100)
    val rows = texts.toDF("t")
      .select(col("t"), WikiText.truncateContent(col("t"), 50).as("c")).collect()
    for (r <- rows) {
      val in = r.getString(0); val out = r.getString(1)
      assert(out.length <= 50, s"<$in> -> <$out>")
      assert(in.startsWith(out), s"<$in> -> <$out>")
    }
  }

  test("dedup: identical texts always produce identical minhash signatures") {
    import spark.implicits._
    val texts = samples(text.suchThat(_.trim.nonEmpty), 30)
    // duplicate every text under two ids
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      texts.zipWithIndex.map { case (t, i) => (i.toLong + 1000, t) })
      .toDF("doc_id", "text")
    val sigs = Dedup.withMinhashSignature(docs, "text", "sig", n = 2, numHashes = 16)
      .select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (i <- texts.indices) {
      assert(sigs(i.toLong) == sigs(i.toLong + 1000), s"text ${texts(i)}")
    }
  }

  test("text stats: ratios are always in [0,1], token counts non-negative") {
    import spark.implicits._
    val texts = samples(Gen.asciiPrintableStr, 150)
    val rows = texts.toDF("t").select(
      TextStats.punctRatio(col("t")).as("p"),
      TextStats.stopwordRatio(col("t")).as("s"),
      TextStats.wsTokenCount(col("t")).as("n"),
      TextStats.qualityScore(col("t")).as("q")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getInt(2) >= 0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("langid: tight-loop UDF form agrees with the Column form on any text") {
    import spark.implicits._
    // mix arbitrary ascii with marker-heavy strings (incl. the fr/es
    // overlap markers, which exercise the tie-break) and empties
    val markerish = Gen.listOf(Gen.oneOf(
      "the", "der", "le", "el", "la", "un", "que", "und", "xyz", "", " "))
      .map(_.mkString(" "))
    val texts = samples(Gen.oneOf(markerish, Gen.asciiPrintableStr), 200)
    val rows = TextStats.withLangId(texts.toDF("t"), "t", "udf_pred")
      .select(col("t"), col("udf_pred"), TextStats.langId(col("t")).as("col_pred"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(1) == r.getString(2), s"text <${r.getString(0)}>")
    }
  }

  test("fuzzy banding is lossless: equals unblocked same-first-token pairs") {
    import spark.implicits._
    // short phrases over a tiny vocabulary => many near-collisions across
    // length-band boundaries, the case the banding must not lose
    val phrase = for {
      w1 <- Gen.oneOf("red", "reed", "red.", "blue", "blues")
      w2 <- Gen.oneOf("cat", "cart", "ca", "dog", "dogs", "")
      w3 <- Gen.oneOf("", "x", "xy", "xyz")
    } yield s"$w1 $w2 $w3".trim
    val rows = samples(phrase, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "txt")
    for (maxDist <- Seq(1, 2, 3)) {
      val got = Dedup.fuzzyPairs(df, "doc_id", "txt", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute-force reference: same first token, levenshtein <= maxDist
      val brute = (for {
        (ia, ta) <- rows; (ib, tb) <- rows
        if ia < ib
        if ta.split("\\s+").head == tb.split("\\s+").head
        if levDist(ta, tb) <= maxDist
      } yield (ia, ib)).toSet
      assert(got == brute, s"maxDist=$maxDist")
    }
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("curation cumsum: partition-count-invariant and equal to sequential prefix sum") {
    import spark.implicits._
    val rowGen = for (v <- Gen.chooseNum(0L, 500L)) yield v
    val vals = samples(rowGen, 300)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val expected = vals.scanLeft(0L)(_ + _).tail // sequential truth
    for (p <- Seq(1, 3, 16)) {
      val got = graft.ext.Curation
        .withGlobalCumsum(df, "id", "v", "cum", numPartitions = p)
        .orderBy("id").collect().map(_.getAs[Long]("cum")).toSeq
      assert(got == expected, s"numPartitions=$p")
    }
  }

  test("connected components: labels are a fixpoint and respect every edge") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 60L); b <- Gen.chooseNum(0L, 60L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val edges = samples(edgeGen, 80).distinct
    val nodes = (0L to 60L).toDF("doc_id")
    val got = graft.ext.Dedup
      .connectedComponents(nodes, edges.toDF("id_a", "id_b"), maxIters = 70)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.releaseAll(spark)
    // every edge's endpoints share a component; every label is a member
    // of its own component and the minimum of that component
    assert(edges.forall { case (a, b) => got(a) == got(b) })
    val byComp = got.groupBy(_._2).view.mapValues(_.keys.min)
    assert(byComp.forall { case (label, minMember) => label == minMember })
  }

  test("deterministic sampling is partitioning-invariant") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("doc_id")
    val base = graft.ext.Curation.deterministicSample(df, "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet
    for (p <- Seq(1, 13)) {
      val re = graft.ext.Curation
        .deterministicSample(df.repartition(p), "doc_id", 0.25)
        .collect().map(_.getLong(0)).toSet
      assert(re == base, s"repartition($p) changed the draw")
    }
  }

  test("PII redaction: alnum-space text is a fixed point; planted PII never survives") {
    import spark.implicits._
    val clean = samples(text, 60)
    val planted = samples(
      for { pre <- text; u <- word; d <- word; post <- text }
        yield s"$pre $u@$d.com 10.1.2.3 +1 555 010 9999 $post", 40)
    val got = (clean ++ planted).toDF("t")
      .select(col("t"), graft.ext.Curation.redactPii(col("t")).as("c")).collect()
    for (r <- got) {
      val (t, c) = (r.getString(0), r.getString(1))
      if (clean.contains(t)) assert(c == t, s"clean text rewritten: <$t> -> <$c>")
      else {
        assert(!c.contains("@") || c.contains("<EMAIL>"))
        assert(!c.contains("10.1.2.3") && !c.contains("555 010"))
      }
    }
  }

  test("stripHtml is idempotent and never leaves a tag") {
    import spark.implicits._
    val html = for {
      a <- text; b <- text; tag <- Gen.oneOf("p", "div", "b", "script")
    } yield
      if (tag == "script") s"$a<script>x='<p>'</script>$b"
      else s"$a<$tag>$b</$tag>"
    val texts = samples(html, 80)
    val once = texts.toDF("t")
      .select(graft.ext.Curation.stripHtml(col("t")).as("c"))
    val twice = once.select(col("c"),
      graft.ext.Curation.stripHtml(col("c")).as("c2")).collect()
    for (r <- twice) {
      assert(r.getString(0) == r.getString(1), "not idempotent")
      assert(!r.getString(0).matches(".*<[^>]+>.*"), s"tag survived: ${r.getString(0)}")
    }
  }

  test("exact-k sampling: exactly k rows, partitioning-invariant, disjoint seeds differ") {
    import spark.implicits._
    val df = spark.range(0, 997).select(col("id").as("doc_id"))
    val base = graft.ext.Curation.sampleExactK(df, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    assert(base.size == 100)
    for (p <- Seq(1, 13)) {
      val re = graft.ext.Curation.sampleExactK(df.repartition(p), "doc_id", 100)
        .collect().map(_.getLong(0)).toSet
      assert(re == base, s"repartition($p) changed the draw")
    }
    val other = graft.ext.Curation.sampleExactK(df, "doc_id", 100, seed = 1)
      .collect().map(_.getLong(0)).toSet
    assert(other != base, "different seed should draw a different set")
  }

  test("T1 links: extracted aliases and titles are always trimmed and non-empty") {
    import spark.implicits._
    val linkText = for {
      pre <- text; t1 <- word; alias <- Gen.option(word); post <- text
    } yield s"$pre [[${t1}${alias.map("|" + _).getOrElse("")}]] $post"
    val texts = samples(linkText, 80)
    val rows = texts.toDF("t")
      .select(explode(WikiText.links(col("t"))).as("l"))
      .select(col("l")("alias").as("a"), col("l")("title").as("ti")).collect()
    for (r <- rows) {
      val a = r.getString(0); val ti = r.getString(1)
      assert(a.nonEmpty && a == a.trim)
      assert(ti.nonEmpty && ti == ti.trim)
      assert(ti.head.isUpper || !ti.head.isLetter)
    }
  }

  test("chunkTokens: overlap-0 partitions exactly; any overlap covers all tokens in order") {
    import spark.implicits._
    import graft.ext.Curation
    val docGen = for {
      words <- Gen.listOf(word)
      size <- Gen.chooseNum(1, 12)
      overlap <- Gen.chooseNum(0, 11).map(o => math.min(o, size - 1))
    } yield (words, size, overlap)
    for (((words, size, overlap), i) <- samples(docGen, 40).zipWithIndex) {
      val df = Seq((i.toLong, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = Curation.chunkTokens(df, "doc_id", "text", size, overlap)
        .orderBy("chunk_idx").collect().map(_.getString(2))
      if (overlap == 0)
        assert(chunks.mkString(" ").trim == words.mkString(" ").trim,
          s"partition round-trip: size=$size words=$words")
      // every window except the last is full-size; windows advance by step
      val toks = words.filter(_.nonEmpty)
      val rebuilt = chunks.zipWithIndex.flatMap { case (c, idx) =>
        val cw = c.split(" ").filter(_.nonEmpty)
        if (idx < chunks.length - 1 && toks.length > size)
          assert(cw.length == size, s"inner window full: $cw")
        cw.drop(if (idx == 0) 0 else overlap)
      }
      assert(rebuilt.toSeq == toks,
        s"dropping the overlap re-concatenates the doc: size=$size overlap=$overlap")
    }
  }

  test("temperatureSample: subset of corpus, smallest key whole, big-key cut monotone in alpha") {
    import spark.implicits._
    import graft.ext.Curation
    val rows = (1L to 300L).map(i => (i, if (i <= 270) "big" else "small"))
    val df = rows.toDF("doc_id", "key")
    val all = rows.map(_._1).toSet
    // flattening: smaller alpha keeps FEWER of the big key (its rate
    // falls toward n_min/n_k); the smallest key is always whole; every
    // draw is deterministic + within-corpus
    val keptBy = Seq(1.0, 0.5, 0.25).map { a =>
      val drawn = Curation.temperatureSample(df, "doc_id", "key", alpha = a)
        .select("doc_id", "key").collect()
      val ids = drawn.map(_.getLong(0)).toSet
      assert(ids.subsetOf(all))
      assert(drawn.count(_.getString(1) == "small") == 30,
        "smallest key kept whole at any alpha")
      a -> drawn.count(_.getString(1) == "big")
    }.toMap
    assert(keptBy(0.25) <= keptBy(0.5) && keptBy(0.5) <= keptBy(1.0),
      s"flattening is monotone in alpha: $keptBy")
    assert(keptBy(1.0) == 270, "alpha = 1 keeps the natural distribution")
  }
}
