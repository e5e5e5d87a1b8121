package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions — a doc-quality pass is a single narrow
  * map stage with no shuffle, and filters over these run inside the scan
  * projection at 100 TB. (Note: array higher-order functions evaluate
  * interpreted, outside whole-stage codegen — cheap here because each
  * array is referenced O(1) times; anything referencing an array per
  * element/hash must stage it as a projection column first, see
  * `withLangId` and Dedup.withMinhashSignature.)
  */
object TextStats {

  /** Whitespace tokens (fast path for token counting). */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish word tokens: letter runs, digit runs, or single
    * punctuation/symbol marks — the shape subword tokenizers split on.
    */
  def tokens(text: Column): Column =
    filter(
      regexp_extract_all(lower(text), lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)),
      t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))
  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  def avgWordLen(text: Column): Column = {
    val ws = wsTokens(text)
    when(size(ws) > 0,
      aggregate(ws, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ws))
      .otherwise(lit(0.0))
  }

  /** Fraction of non-space chars that are punctuation/symbols. */
  def punctRatio(text: Column): Column = {
    val noSpace = regexp_replace(text, "\\s+", "")
    val punct = regexp_replace(noSpace, "[\\p{L}\\p{N}]+", "")
    when(length(noSpace) > 0, length(punct).cast("double") / length(noSpace))
      .otherwise(lit(0.0))
  }

  /** Common English stopwords (public, universally published list shape). */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "were", "it", "that", "this", "on", "for", "with", "as", "at", "by",
    "be", "from", "has", "have", "had", "not", "but", "they", "their")

  def stopwordRatio(text: Column, stopwords: Seq[String] = enStopwords): Column = {
    val sw = typedLit(stopwords)
    val toks = wsTokens(lower(text))
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Heuristic document quality in [0,1]: length band + moderate word
    * length + low punctuation + some stopwords (Gopher/C4-style rule
    * shapes, re-expressed as one codegen'd expression).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = when(length(text).between(200, 20000), 1.0)
      .when(length(text).between(50, 199), 0.5)
      .otherwise(lit(0.0))
    val wl = avgWordLen(text)
    val wordScore = when(wl.between(3.0, 10.0), 1.0).otherwise(lit(0.0))
    val punctScore = when(punctRatio(text) < 0.2, 1.0).otherwise(lit(0.0))
    val swScore = when(stopwordRatio(text) > 0.05, 1.0).otherwise(lit(0.0))
    when(length(coalesce(text, lit(""))) === 0, 0.0)
      .otherwise(round((lenScore + wordScore + punctScore + swScore) / 4.0, 4))
  }

  /** Gopher-style HARD quality gate — the boolean rule the soft
    * [[qualityScore]] averages: token-count band, mean-word-length band,
    * symbol cap, minimum stopword evidence. Threshold constants
    * deliberately avoid small-integer ratios, so the engine-identical
    * doubles underneath can never tie exactly on a boundary (which keeps
    * the gate bit-reproducible across engines).
    *
    * Column-composition form, kept as the semantic reference: each
    * predicate re-tokenizes (interpreted HOF lambdas see no
    * common-subexpression elimination), which makes it ~10x the cost of
    * the single-pass [[qualityKeep]] loop that replaces it in the hot
    * path (TextStatsSpec pins parity).
    */
  def qualityKeepExpr(text: Column): Column =
    wsTokenCount(text).between(5, 100000) &&
      avgWordLen(text) > 3.017 && avgWordLen(text) < 9.983 &&
      punctRatio(text) < 0.1937 &&
      stopwordRatio(text) > 0.0213

  private val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    enStopwords.foreach(s.add)
    s
  }

  /** Single-pass JVM form of the gate: one scan computes token count,
    * total token length, stopword hits and the punct/nospace counts.
    * Whitespace class matches regex `\s` exactly (NOT the broader
    * Character.isWhitespace), letters/digits match `[\p{L}\p{N}]`;
    * the scan advances by CODE POINT and counts lengths in code points —
    * Spark's `length()` and the DuckDB oracle both count code points, so
    * a UTF-16-unit loop would double-count astral chars (and classify
    * lone surrogates) near the gate thresholds. Bit-parity vs
    * [[qualityKeepExpr]] pinned in TextStatsSpec, incl. non-BMP text.
    */
  private[ext] def qualityKeepImpl(text: String): Boolean = {
    if (text == null) return false
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    def isLetterOrNum(cp: Int): Boolean = {
      val t = Character.getType(cp)
      Character.isLetter(cp) || t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }
    var n = 0L; var totalLen = 0L; var hits = 0L
    var punct = 0L; var nospace = 0L
    val len = text.length
    var i = 0; var tokStart = -1
    while (i <= len) {
      val ws = i == len || isWs(text.charAt(i))
      if (!ws) {
        if (tokStart < 0) tokStart = i
        val cp = text.codePointAt(i)
        nospace += 1
        if (!isLetterOrNum(cp)) punct += 1
        i += Character.charCount(cp)
      } else {
        if (tokStart >= 0) {
          n += 1; totalLen += text.codePointCount(tokStart, i)
          if (stopwordSet.contains(
              text.substring(tokStart, i).toLowerCase(java.util.Locale.ROOT)))
            hits += 1
          tokStart = -1
        }
        i += 1
      }
    }
    if (n < 5 || n > 100000) return false
    val awl = totalLen.toDouble / n
    if (!(awl > 3.017 && awl < 9.983)) return false
    val pr = if (nospace > 0) punct.toDouble / nospace else 0.0
    if (!(pr < 0.1937)) return false
    val swr = hits.toDouble / n
    swr > 0.0213
  }

  private val qualityKeepUdf = udf(qualityKeepImpl _)

  /** The gate, hot-path form (single-pass JVM loop). */
  def qualityKeep(text: Column): Column = qualityKeepUdf(text)

  /** Language-marker token lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: langId is a scoring shape, swappable for
    * real profiles.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "it", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que"))

  /** Per-language marker hit-rate; langId picks the argmax (ties break by
    * language code order for determinism, "und" = undetermined when no
    * marker hits).
    */
  def langScores(text: Column): Column = {
    val toks = wsTokens(lower(text))
    map(langMarkers.toSeq.sortBy(_._1).flatMap { case (lang, markers) =>
      val m = typedLit(markers)
      Seq(lit(lang),
        when(size(toks) > 0,
          size(filter(toks, t => array_contains(m, t))).cast("double") / size(toks))
          .otherwise(lit(0.0)))
    }: _*)
  }

  private def langIdFromTokens(toks: Column): Column = {
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val m = typedLit(markers)
      struct(
        (size(filter(toks, t => array_contains(m, t))).cast("double") /
          greatest(size(toks), lit(1))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best("score") > 0.0, best("lang")).otherwise(lit("und"))
  }

  def langId(text: Column): Column = langIdFromTokens(wsTokens(lower(text)))

  /** marker token -> indices of languages containing it (markers overlap
    * across languages: 'la', 'un', 'que' are both fr and es).
    */
  private lazy val markerLangs: Map[String, Array[Int]] = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    langs.zipWithIndex
      .flatMap { case ((_, ms), i) => ms.map(_ -> i) }
      .groupBy(_._1)
      .map { case (tok, hits) => tok -> hits.map(_._2).sorted.toArray }
  }

  private lazy val sortedLangCodes: Array[String] =
    langMarkers.keys.toArray.sorted

  /** Tight-loop UDF language ID over the staged token array — one map
    * lookup per token instead of 4 interpreted array_contains HOF scans
    * (same rationale as Dedup.minhashSigUdf; langid at sf0.1 dropped from
    * ~6.5 s interpreted to well under 2 s). Semantics are bit-identical to
    * the Column form `langId`: hit-rate argmax, score ties break to the
    * lexicographically larger code (>= while scanning in sorted order),
    * zero hits ⇒ "und". PropertySpec asserts UDF == Column form.
    */
  private lazy val langIdUdf = {
    val ml = markerLangs
    val codes = sortedLangCodes
    udf((toks: Seq[String]) => {
      if (toks == null || toks.isEmpty) "und"
      else {
        val hits = new Array[Int](codes.length)
        val it = toks.iterator
        while (it.hasNext) {
          ml.get(it.next()) match {
            case Some(ls) =>
              var i = 0
              while (i < ls.length) { hits(ls(i)) += 1; i += 1 }
            case None =>
          }
        }
        var best = 0
        var bestHits = hits(0)
        var i = 1
        while (i < codes.length) {
          if (hits(i) >= bestHits) { best = i; bestHits = hits(i) }
          i += 1
        }
        if (bestHits > 0) codes(best) else "und"
      }
    })
  }

  /** Staged language ID: the token array is computed once per row instead
    * of once per language (same staging rationale as
    * Dedup.withMinhashSignature), and the scoring loop runs in the JVM.
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
                 outCol: String): org.apache.spark.sql.DataFrame =
    // raw codegen'd split: empty tokens match no marker, so compaction is
    // unnecessary (argmax is over marker hit counts)
    df.withColumn("__li_toks", split(lower(col(textCol)), "\\s+"))
      .withColumn(outCol, langIdUdf(col("__li_toks")))
      .drop("__li_toks")

  /** Content fingerprint: md5 over the sorted distinct token bag — robust
    * to word order and duplication, the cheap member of the dedup family.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Rolling polynomial hash (Rabin-Karp shape) over whitespace tokens —
    * order-sensitive fingerprint: h = (h*31 + tokenHash) mod (2^31-1),
    * expressed as a codegen'd aggregate. The 31-bit modulus keeps every
    * intermediate product inside a Long under ANSI arithmetic.
    */
  def rollingHash(text: Column): Column = {
    val m = lit(2147483647L)
    aggregate(wsTokens(text), lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), m), m))
  }

  /** Overlapping (non-distinct) token n-grams — counts matter here, unlike
    * Dedup.shingles' set semantics. Empty array below n tokens.
    */
  private[ext] def ngramsWithDups(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Gopher/RefinedWeb-style repetition signals, per document:
    *
    *  - `top_2gram_frac`: tokens covered by the single most frequent
    *    2-gram, / n_tokens — catches "foo bar foo bar foo bar" spam;
    *  - `dup_3gram_frac`: tokens covered by 3-grams occurring more than
    *    once (overlaps counted, so boilerplate-heavy docs can exceed 1 —
    *    it is a filter signal, not a probability), / n_tokens.
    *
    * Relational shape, not a per-row HOF crunch: two explode + hash-agg
    * passes, each a single shuffle keyed by (doc, gram) — the form that
    * survives 100 TB, where a quality pass precedes training-data
    * filtering (threshold rows on these columns).
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      wsTokens(lower(col(textCol))).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n_tokens"))
    val top2 = base
      .select(col("doc_id"), explode(ngramsWithDups(col("w"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("m2"))
    val dup3 = base
      .select(col("doc_id"), explode(ngramsWithDups(col("w"), 3)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .groupBy("doc_id").agg(sum(col("cnt") * 3).as("dup3"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(top2, Seq("doc_id"), "left")
      .join(dup3, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("m2"), lit(0L)) * 2.0 / col("n_tokens"))
          .otherwise(lit(0.0)).as("top_2gram_frac"),
        when(col("n_tokens") > 0,
          coalesce(col("dup3"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_3gram_frac"))
  }

  /** Character-level Shannon entropy (bits/char) — the cheap gibberish
    * detector: natural prose sits around 4–4.5 bits, base64/hex blobs and
    * single-char spam sit far outside, so thresholding both ends cuts
    * binary junk and degenerate repetition. Relational shape (explode
    * chars → per-doc char histogram → -Σ p·log2 p), linear and
    * engine-portable; the two shuffles are keyed by (doc, char) and doc.
    */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val chars = df.select(col(idCol).as("doc_id"),
      explode(filter(split(col(textCol), ""), c => length(c) > 0)).as("ch"))
    val hist = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val ent = hist.groupBy("doc_id")
      .agg(sum("c").as("n"),
        sum(col("c") * log2(col("c"))).as("clog"))
      // -Σ (c/n)·log2(c/n) = log2(n) − (Σ c·log2 c)/n — one pass, no
      // second join against the total
      .select(col("doc_id"), col("n"),
        (log2(col("n")) - col("clog") / col("n")).as("entropy"))
    df.select(col(idCol).as("doc_id"))
      .join(ent, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_chars_counted"),
        coalesce(col("entropy"), lit(0.0)).as("char_entropy"))
  }

  /** Unigram language-model scoring — the CCNet-style perplexity proxy:
    * each document scored by the mean negative log-likelihood of its
    * tokens under the CORPUS unigram distribution with add-alpha
    * smoothing, p(w) = (c_w + α) / (N + α·V). Documents full of rare or
    * junk tokens score high; mainstream text scores low — threshold the
    * column for quality filtering (a real CCNet ranks against an external
    * LM; the relational scaffold is identical and the model here is
    * derived from the corpus itself, so the whole pass stays
    * engine-portable and oracle-checkable).
    *
    * Shape: one token explode (position-counted), a vocab-sized count
    * agg, N and V via a broadcast 1-row agg, a token-keyed join back
    * (linear, vocabulary join), and a per-doc avg. No driver-side model
    * state.
    */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String, alpha: Double = 1.0)
      : org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(wsTokens(lower(col(textCol)))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val nv = counts.agg(sum(col("c")).as("N"),
      count(lit(1)).as("V"))
    val scored = toks.join(counts, Seq("tok"))
      .crossJoin(broadcast(nv))
      .select(col("doc_id"),
        (-log((col("c") + lit(alpha)) /
          (col("N") + lit(alpha) * col("V")))).as("nll"))
    val base = df.select(col(idCol).as("doc_id"))
    base.join(
        scored.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"),
          avg(col("nll")).as("nll_per_token")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("nll_per_token"), lit(0.0)).as("nll_per_token"))
  }

  /** CROSS-document repeated n-gram fraction — the boilerplate signal
    * (RefinedWeb/CCNet shape): per document, the fraction of its n-gram
    * WINDOWS (non-distinct, position-counted) whose gram also occurs in
    * at least `minDocs` documents total — headers, footers, navigation
    * chrome and license blocks shared across a crawl score high while
    * within-doc repetition (repetitionStats' axis) does not inflate it.
    *
    * Relational shape, linear end to end: one explode, a (doc, gram)
    * hash-agg, a gram-level doc-frequency hash-agg (map-side combined —
    * input is already distinct per doc), and a join back keyed on gram.
    * No pair joins anywhere; the gram relation is corpus-sized, not
    * quadratic. Returns (doc_id, n_windows, cross_frac).
    */
  def crossDocRepetition(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, n: Int = 5,
                         minDocs: Int = 2): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
        wsTokens(lower(col(textCol))).as("w"))
      .select(col("doc_id"),
        greatest(size(col("w")) - (n - 1), lit(0)).cast("long").as("n_windows"),
        col("w"))
    val perDocGram = base
      .select(col("doc_id"), explode(ngramsWithDups(col("w"), n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
    val docFreq = perDocGram.groupBy("g")
      .agg(count(lit(1)).as("df_docs"))
      .filter(col("df_docs") >= minDocs)
      .select("g")
    val repeated = perDocGram.join(docFreq, Seq("g"))
      .groupBy("doc_id").agg(sum("cnt").as("rep_wins"))
    base.select(col("doc_id"), col("n_windows"))
      .join(repeated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        when(col("n_windows") > 0,
          coalesce(col("rep_wins"), lit(0L)).cast("double") / col("n_windows"))
          .otherwise(lit(0.0)).as("cross_frac"))
  }
}
