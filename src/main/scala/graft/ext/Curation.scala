package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic sampling for corpus
  * mixes/splits, and token-budget sequence packing (the concatenate-and-
  * chunk step before tokenization).
  *
  * Everything is deterministic-by-construction (md5 buckets, explicit
  * orders) — a curation decision must be reproducible across reruns and
  * engines, so nothing here uses RNG state or Spark's seeded samplers
  * (whose draws are partitioning-dependent).
  */
object Curation {

  /** Stable bucket in [0, buckets) from an id column — md5-derived like
    * Dedup.portableHash, so any engine reproduces it bit-for-bit.
    */
  def hashBucket(c: Column, buckets: Int = 10000, seed: Int = 0): Column =
    pmod(Dedup.portableHash(c, seed), lit(buckets.toLong))

  /** Deterministic Bernoulli sample: keep iff bucket(id) < frac·buckets.
    * Same row set on every rerun, any partitioning, any engine — the
    * property train/eval splits need (Spark's `sample` draws depend on
    * partition layout). A narrow filter: predicate-pushdown-friendly.
    */
  def deterministicSample(df: DataFrame, idCol: String, frac: Double,
                          buckets: Int = 10000, seed: Int = 0): DataFrame =
    df.filter(hashBucket(col(idCol), buckets, seed) <
      lit(math.round(frac * buckets)))

  /** Stratified deterministic sample: per-stratum keep fractions (e.g.
    * per-language mix weights for a training corpus), unmatched strata
    * keep `defaultFrac`. One narrow filter — no shuffle, no per-stratum
    * passes.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFrac: Double = 0.0,
                       buckets: Int = 10000, seed: Int = 0): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(defaultFrac * buckets))) {
      case (acc, (k, f)) =>
        when(col(stratumCol) === k, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), buckets, seed) < threshold)
  }

  /** Per-row WEIGHTED deterministic sample: keep iff bucket(id) <
    * weight·buckets, where `weightCol` is any [0,1] column — the
    * continuous generalization of [[stratifiedSample]] (whose strata
    * become a weight expression), e.g. quality-proportional corpus
    * mixing. Same reproducibility contract: one narrow filter, identical
    * draw on any rerun/partitioning/engine.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     buckets: Int = 10000, seed: Int = 0): DataFrame =
    df.filter(hashBucket(col(idCol), buckets, seed) <
      round(col(weightCol) * buckets))

  /** Deterministic EXACT-k sample: the k rows with the smallest
    * md5(seed||id) — a uniform draw that is reproducible across reruns,
    * partitionings and engines (same rationale as [[deterministicSample]],
    * which can only promise a fraction in expectation). Distributed
    * top-k (TakeOrdered per partition, merged on the driver): no global
    * sort, no single-task window.
    */
  def sampleExactK(df: DataFrame, idCol: String, k: Int,
                   seed: Int = 0): DataFrame =
    df.withColumn("__rk", md5(concat(lit(s"s$seed:"), col(idCol).cast("string"))))
      // NULLS LAST on both keys: a null id hashes to a null rank, and
      // Spark's default NULLS FIRST would deterministically draw every
      // null-id row while SQL engines (the oracle included) sort them
      // last — null ids are only drawn when the non-null rows run out
      .orderBy(col("__rk").asc_nulls_last, col(idCol).asc_nulls_last)
      .limit(k)
      .drop("__rk")

  /** PII redaction: emails, IPv4 addresses and phone-shaped digit runs
    * replaced by typed placeholders — the standard pre-training scrub
    * pass. One codegen'd regexp_replace chain, narrow and pushdown-
    * friendly; the patterns are deliberately alternation-free and valid
    * in both Java regex and RE2 with identical match semantics, so the
    * pass is engine-portable (and oracle-checked). Order matters: emails
    * first (their local part can look phone-like), then IPs (dotted
    * digits would match the phone shape), then phones; placeholders
    * contain no digits, so later passes never touch earlier rewrites.
    */
  def redactPii(text: Column): Column = {
    // the local part is POSSESSIVE (++): on ordinary prose nearly every
    // char is in the class, and a greedy + makes Java's engine backtrack
    // O(n²) through each alnum run before failing at the missing '@' —
    // possessive is equivalent here ('@' is not in the class, so
    // backtracking can never resurrect a match) and linear. The DuckDB
    // oracle keeps the plain '+': RE2 is an automaton, already linear,
    // and does not accept possessive syntax.
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]++@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d() .-]{7,}\\d", "<PHONE>")
  }

  /** Unicode NFC composition (é as one code point, not e + combining
    * accent) — the canonical-form pass that makes hashing/dedup robust to
    * source encoding differences. JVM `java.text.Normalizer` UDF: Spark
    * has no native normalizer, and the Unicode tables are the same ICU
    * data every engine ships, so the pass is engine-portable.
    */
  def normalizeUnicode(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    f(text)
  }

  /** Diacritic folding (é→e, ü→u, ç→c): NFD-decompose then strip every
    * combining mark — byte-identical to DuckDB's `strip_accents` on the
    * Latin diacritic range (oracle-checked); characters with no
    * decomposition (ß, œ, ø) pass through unchanged in BOTH engines'
    * common subset but are excluded from the oracle gate, which ASCII-
    * gates its input like multimodal_features.
    */
  def foldAccents(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}+", ""))
    f(text)
  }

  /** HTML/markup stripping for CC-style extraction: tags out, entities
    * for the big five decoded, whitespace collapsed. Pure codegen'd
    * regexp chain — narrow, pushdown-friendly. (A real extraction
    * pipeline puts a DOM-aware boilerplate remover here; this is the
    * always-applicable cheap pass.)
    */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    // &amp; must decode LAST: decoding it first turns double-escaped
    // entities ("&amp;lt;b&amp;gt;") into real-looking markup AFTER the
    // tag strip already ran, so a later pass would eat user text
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** C4's line-level cleanup rule (the published heuristic: keep only
    * lines that end in terminal punctuation and carry at least
    * `minWords` words; drop the whole document if fewer than `minLines`
    * lines survive). One HOF chain per document — no explode/re-group
    * shuffle.
    */
  def c4LineFilter(text: Column, minWords: Int = 5,
                   minLines: Int = 3): Column = {
    val kept = filter(split(text, "\n"), line =>
      line.rlike("[.!?\"']\\s*$") &&
        size(filter(split(line, "\\s+"), w => length(w) > 0)) >= minWords)
    when(size(kept) >= minLines, array_join(kept, "\n"))
      .otherwise(lit(null))
  }

  /** Per-key document cap (C4/CC-style per-domain cap): keep at most
    * `n` rows per `keyCol`, deterministically the lowest `orderCol`
    * first. One shuffle on the key; the rank is computed per key
    * partition (NOT a global no-partition window). A single pathological
    * key that dwarfs every other still funnels through one task — for
    * that shape, pre-filter with an approximate per-key count and salt,
    * which trades exactness of the cut; this operator keeps the exact
    * deterministic semantics curation reproducibility wants.
    */
  def capPerKey(df: DataFrame, keyCol: String, n: Int,
                orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(orderCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Global prefix sum of `valueCol` in `orderCol` order WITHOUT a
    * single-partition window (Window.orderBy with no partitionBy funnels
    * the whole dataset through one task — the classic scale trap). The
    * distributed shape: range-repartition by the order column (global
    * order across partitions), per-partition local cumsum, and a
    * driver-side prefix of the P per-partition totals (P values, not
    * data) added back as offsets. Two narrow passes + one P-row collect.
    *
    * PRECONDITION: `orderCol` must be integral and UNIQUE — the cumsum is
    * joined back on it, so duplicate keys would fan out rows and yield
    * ambiguous prefix sums (aggregate duplicates first if needed). The
    * uniqueness check is free: range repartition puts equal keys in one
    * partition and the local sort makes them adjacent, so the cumsum pass
    * itself throws on the first duplicate.
    */
  def withGlobalCumsum(df: DataFrame, orderCol: String, valueCol: String,
                       outCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val pairs = df.select(col(orderCol).cast("long"), col(valueCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(p, col(orderCol))
      .sortWithinPartitions(orderCol)
    val rdd = pairs.rdd
    val partTotals = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_._2).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // offsets(i) = sum of parts < i
    val cum = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      var prev = Long.MinValue; var first = true
      it.map { case (o, v) =>
        if (!first && o == prev)
          throw new IllegalArgumentException(
            s"withGlobalCumsum: duplicate $orderCol value $o — the order " +
              "column must be unique (see scaladoc)")
        first = false; prev = o
        acc += v; (o, acc)
      }
    }.toDF(orderCol, outCol)
    df.join(cum, Seq(orderCol))
  }

  /** Benchmark decontamination (the GPT-3/PaLM n-gram collision rule):
    * training documents sharing any word `n`-gram with an evaluation set
    * are flagged for dropping. The eval side is SMALL by contract
    * (benchmarks are thousands of rows; the corpus is the 100 TB side),
    * so its distinct n-grams broadcast and the corpus pass is one narrow
    * shingle explode + broadcast join + hash agg — no shuffle of corpus
    * text, no pair blowup. Shingle semantics are [[Dedup.shingles]]
    * (lower-cased, whitespace tokens, per-doc distinct; a doc shorter
    * than `n` tokens contributes its whole text as one shingle), so the
    * operator composes with the dedup family and stays engine-portable.
    *
    * Returns (idCol, n_hits): the number of DISTINCT shared n-grams per
    * contaminated document (clean docs don't appear — semantics of the
    * published rule: any hit ⇒ contaminated).
    */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
                        bench: DataFrame, benchTextCol: String,
                        n: Int = 13): DataFrame = {
    val benchGrams = Dedup.withShingleArray(
        bench.select(col(benchTextCol)), benchTextCol, "__sg", n)
      .select(explode(col("__sg")).as("__gram"))
      .distinct()
    Dedup.withShingleArray(
        docs.select(col(idCol), col(textCol)), textCol, "__sg", n)
      .select(col(idCol), explode(col("__sg")).as("__gram"))
      .join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** FUZZY contamination: training docs that are MinHash near-duplicates
    * of a benchmark document (est. Jaccard >= threshold) — the match
    * level exact n-gram overlap misses: light paraphrase, token-level
    * edits, reflowed whitespace. Returns (idCol, n_bench_matches,
    * max_est) per contaminated training doc.
    *
    * Shape: the bench side gets synthetic NEGATIVE ids and unions into
    * ONE [[Dedup.minhashDupPairs]] pass, so candidate generation is the
    * same banded-LSH bucket join with the same degenerate-bucket cap —
    * nothing bespoke to re-verify at scale. Cross pairs are the (bench,
    * train) rows (pairs order ids ascending, so the bench id is always
    * id_a). CONTRACTS: training ids must be >= 0 (the negative range is
    * the bench side's namespace), and the bench set is small by nature
    * (a benchmark), so its distinct + row_number pass — a single-
    * partition window — is bench-sized driver-adjacent work, never
    * corpus-sized.
    */
  def contaminationHitsFuzzy(docs: DataFrame, idCol: String, textCol: String,
                             bench: DataFrame, benchTextCol: String,
                             n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                             threshold: Double = 0.8,
                             maxBucketSize: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val benchIds = bench.select(col(benchTextCol).as("__text")).distinct()
      .withColumn("doc_id", -row_number().over(Window.orderBy(col("__text"))))
      .select(col("doc_id"), col("__text"))
    // the negative id range is the bench side's namespace — a negative
    // TRAINING id would silently collide with a synthetic bench id and
    // be misattributed by the id_a<0 filter, so enforce the contract
    // in-plan (a narrow when/raise_error column, no extra pass)
    val all = docs.select(
        when(col(idCol).cast("long") < 0,
          raise_error(concat(
            lit("contaminationHitsFuzzy: training ids must be >= 0 " +
              "(negative ids are reserved for the synthetic benchmark " +
              "side); got "), col(idCol).cast("string"))))
          .otherwise(col(idCol).cast("long")).as("doc_id"),
        col(textCol).as("__text"))
      .unionByName(benchIds)
    Dedup.minhashDupPairs(all, "doc_id", "__text", n, numHashes, bands,
        threshold, maxBucketSize)
      .filter(col("id_a") < 0 && col("id_b") >= 0)
      .groupBy(col("id_b").as(idCol))
      .agg(count(lit(1)).as("n_bench_matches"),
        max(col("est_jaccard")).as("max_est"))
  }

  /** Drop every document [[contaminationHits]] flags — the decontaminated
    * corpus. Anti join on ids only; document payloads never shuffle.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 13): DataFrame =
    docs.join(contaminationHits(docs, idCol, textCol, bench, benchTextCol, n)
        .select(idCol),
      Seq(idCol), "left_anti")

  /** Temperature-flattened mixture sampling (the subsample-only form of
    * the UniMax / multilingual-T5 recipe): per-key keep rate
    * (n_min / n_k)^(1−alpha) — post-sample counts ∝ n_k^alpha, so
    * alpha = 1 keeps the natural distribution (every key whole) and
    * alpha → 0 flattens toward uniform (every key cut to ≈ n_min). The
    * smallest key is always kept whole — flattening by subsampling can
    * only shrink the LARGE keys toward it (upsampling small keys is a
    * repeat/epoch decision, out of scope for a row filter). The whole
    * mixture is computed IN-PLAN: one tiny per-key count agg, a
    * broadcast threshold join, and the same md5-bucket filter as
    * [[deterministicSample]] — no driver-side collect anywhere.
    *
    * alpha = 0.5 (the common default) takes an integer-exact path —
    * floor(sqrt((buckets² · n_min) div n_k)) — whose arithmetic any
    * engine reproduces bit-for-bit (sqrt of an exact integer < 2^53 is
    * correctly rounded everywhere), so the draw is oracle-checkable.
    * Other alphas use pow(): reproducible across reruns and
    * partitionings, but last-ulp sensitive across engines (documented
    * tradeoff, same split as portable-md5 vs xxhash elsewhere).
    * Requires buckets² · n_min < 2^53 (≈ 9·10¹⁰ rows at the default
    * granularity — lower `buckets` past that). Rows with a NULL key are
    * dropped (equi-join semantics) — coalesce to a sentinel first if
    * null keys are meaningful.
    */
  def temperatureSample(df: DataFrame, idCol: String, keyCol: String,
                        alpha: Double = 0.5,
                        buckets: Int = 10000, seed: Int = 0): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__n"))
    val withMin = counts.crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
    val threshold =
      if (alpha == 0.5)
        floor(sqrt(call_function("div",
          lit(buckets.toLong * buckets) * col("__nmin"), col("__n"))))
      else
        floor(lit(buckets.toDouble) *
          pow(col("__nmin").cast("double") / col("__n"), lit(1.0 - alpha)))
    val thresholds = withMin.select(col(keyCol), threshold.as("__thr"))
    df.join(broadcast(thresholds), Seq(keyCol))
      .filter(hashBucket(col(idCol), buckets, seed) < col("__thr"))
      .drop("__thr")
  }

  /** Sentence segmentation: explode each document into sentences split on
    * terminal punctuation followed by whitespace — the regex-level
    * segmenter every curation pipeline starts from (an ML segmenter slots
    * in behind the same (doc_id, sent_idx, sentence) contract). The
    * pattern is lookaround-free so it means the same thing in Java regex
    * and RE2 (engine-portable, oracle-checked); the terminal mark of each
    * non-final sentence is consumed by the split (documented — keeping it
    * needs lookbehind, which RE2 lacks). Empty fragments are dropped on
    * both sides (Java strips trailing empties, RE2 engines keep them —
    * the explicit filter makes the engines agree).
    */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(
        filter(split(col(textCol), "[.!?]\\s+"), s => length(trim(s)) > 0)))
      .select(col(idCol), col("pos").cast("int").as("sent_idx"),
        trim(col("col")).as("sentence"))

  /** Sliding-window token chunking (RAG / long-context eval prep): each
    * document explodes into windows of `chunkSize` whitespace tokens
    * advancing by `chunkSize - overlap`; the last window may be shorter
    * (never empty for non-empty docs), and a doc of ≤ `chunkSize` tokens
    * yields exactly one chunk (an empty doc yields one empty chunk, so no
    * rows vanish silently). Pure per-row HOF explode — narrow, no
    * shuffle; the token array is staged as a projection column so the
    * window transforms don't re-split per element.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val toks = col("__toks")
    val nChunks = when(size(toks) <= chunkSize, lit(1L))
      .otherwise(ceil((size(toks) - lit(overlap)).cast("double") / step))
    val windows = transform(sequence(lit(0L), nChunks - 1), i =>
      struct(
        array_join(slice(toks, (i * step + 1).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(toks, (i * step + 1).cast("int"), lit(chunkSize)))
          .as("n_chunk_tokens")))
    // null text coalesces to the empty token array — one empty chunk, the
    // same contract as an empty string (no silent row loss, no -1 sizes)
    df.withColumn("__toks",
        coalesce(TextStats.wsTokens(col(textCol)), array().cast("array<string>")))
      .select(col(idCol), posexplode(windows))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col.chunk_text"), col("col.n_chunk_tokens"))
  }

  /** Token-budget sequence packing, pretraining shape: documents are
    * concatenated in `orderCol` order and cut into `budget`-token bins; a
    * document knows its global token offset and which bin(s) it lands in
    * (`start_bin` == `end_bin` iff it doesn't straddle a boundary). Built
    * on the distributed cumsum — no single-task window anywhere.
    */
  def packTokenBins(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    val withCum = withGlobalCumsum(df, orderCol, tokenCol, "cum_tokens")
    val startBin = floor((col("cum_tokens") - col(tokenCol)) / budget)
    withCum.select(col(orderCol), col(tokenCol),
      (col("cum_tokens") - col(tokenCol)).as("start_offset"),
      startBin.as("start_bin"),
      // empty docs (0 tokens) occupy no span: end_bin = start_bin
      greatest(startBin, floor((col("cum_tokens") - 1) / budget)).as("end_bin"))
  }
}
