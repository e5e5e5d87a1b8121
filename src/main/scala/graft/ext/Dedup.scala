package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine — the standard large-corpus family, each designed so
  * the candidate-generation step bounds the quadratic blowup:
  *
  *  - exact: one hash shuffle, no pairs at all
  *  - n-gram Jaccard: pairs only for docs sharing a (rare) shingle
  *  - MinHash LSH: pairs only within a band bucket
  *  - SimHash: pairs only within a 16-bit chunk bucket
  *  - embedding: pairs only within a hyperplane-sign bucket
  *
  * Portable hashing note: oracle-checkable variants use md5-derived hashes
  * (identical in any engine); hot paths use xxhash64 (Spark codegen'd).
  */
object Dedup {

  /** First 15 hex chars of md5 as a non-negative Long — engine-portable
    * (DuckDB: `from_hex`/`substr` reproduce it bit-for-bit).
    */
  def portableHash(c: Column, seed: Int = 0): Column =
    conv(substring(md5(concat(c, lit("#" + seed))), 1, 15), 16, 10).cast("long")

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact duplicate groups by content hash: one row per distinct text with
    * the canonical (min) id and the duplicate count. Single hash-agg
    * shuffle; at 100 TB this is the cheapest full-corpus dedup.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_docs"))

  /** Keep one row per distinct text (the min-id winner). Implemented as a
    * self-contained window-free aggregation + semi join so it scales: the
    * groups side is only (hash, winner).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = exactGroups(df, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------------
  // Shingles
  // ------------------------------------------------------------------

  /** Word n-gram shingles (distinct) of the lower-cased text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextStats.wsTokens(lower(text))
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(when(size(toks) > 0, array(array_join(toks, " ")))
        .otherwise(array()))
  }

  /** JVM shingle loop — same output as the Column form `shingles` (first-
    * occurrence-ordered distinct space-joined n-grams), minus the
    * interpreted HOF cost. ngramJaccardPairs scans the shingle relation
    * three times (sizes, stop-shingles, pair join); each scan re-evaluates
    * the projection, so the per-scan cost matters.
    */
  private def shinglesUdf(n: Int) = udf((rawToks: Seq[String]) => {
    val toks = if (rawToks == null) null else rawToks.filter(_.nonEmpty)
    if (toks == null || toks.isEmpty) Array.empty[String]
    else if (toks.length >= n) {
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size()))
    } else Array(toks.mkString(" "))
  })

  /** Staged shingle-array column via the JVM loop — the production path
    * for any consumer that shingles a full corpus (the Column form
    * [[shingles]] is interpreted HOFs, re-evaluated per scan; the staged
    * UDF was measured ~10× cheaper on the decontamination pass). Output
    * is bit-identical to [[shingles]] (first-occurrence-ordered distinct
    * space-joined n-grams; DedupSpec pins the parity).
    */
  def withShingleArray(df: DataFrame, textCol: String, outCol: String,
                       n: Int = 3): DataFrame =
    df.withColumn("__sg_toks", split(lower(col(textCol)), "\\s+"))
      .withColumn(outCol, shinglesUdf(n)(col("__sg_toks")))
      .drop("__sg_toks")

  /** (doc_id, shingle) exploded pairs. */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int) =
    withShingleArray(df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "__text", "__sg", n)
      .select(col("doc_id"), explode(col("__sg")).as("shingle"))

  // ------------------------------------------------------------------
  // n-gram Jaccard
  // ------------------------------------------------------------------

  /** Pairwise Jaccard similarity over word n-gram shingle sets, for pairs
    * sharing at least one shingle. `maxShingleFreq` drops shingles shared
    * by more than that many docs before pairing — the stop-shingle guard
    * that keeps the self-join from going quadratic on boilerplate at scale
    * (dropped shingles can only lower recall on already-common text).
    */
  /** Candidate pairs (docs sharing ≥1 kept shingle) with intersection
    * size — the quantity the `maxShingleFreq` stop-shingle knob must keep
    * near-linear in corpus size (measured by the scale-stress bench).
    */
  def ngramCandidates(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, maxShingleFreq: Int = 1000): DataFrame = {
    val rows = shingleRows(df, idCol, textCol, n)
    // stop-shingle guard as a broadcast ANTI join on the drop list: the
    // set of shingles ABOVE the cap is tiny at any scale (boilerplate
    // only), unlike the keep side (≈ all shingles) or a per-shingle
    // window (full shuffle + sort of the exploded rows)
    val stopShingles = rows.groupBy("shingle").agg(count(lit(1)).as("freq"))
      .filter(col("freq") > maxShingleFreq)
      .select("shingle")
    // staged (r19): both sides of the pair join re-derived the shingle
    // explosion + anti join otherwise — the ngramCandidateStats
    // discipline applied here too
    val filtered = graft.Caches.stage(
      rows.join(broadcast(stopShingles), Seq("shingle"), "left_anti"))
    filtered.as("a")
      .join(filtered.as("b"), col("a.shingle") === col("b.shingle")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Shared scaffolding for the shingle-set similarity measures:
    * candidate pairs with intersection size AND both set sizes, all
    * measured over the KEPT shingles (post stop-shingle cap) — sizes from
    * the unfiltered sets would bias every ratio downward for docs
    * carrying capped boilerplate shingles (a fully-contained excerpt
    * could never reach containment 1.0). The filtered relation is staged:
    * it feeds the sizes agg and both sides of the pair join.
    */
  private def ngramCandidateStats(df: DataFrame, idCol: String,
                                  textCol: String, n: Int,
                                  maxShingleFreq: Int): DataFrame = {
    val rows = shingleRows(df, idCol, textCol, n)
    val stopShingles = rows.groupBy("shingle").agg(count(lit(1)).as("freq"))
      .filter(col("freq") > maxShingleFreq)
      .select("shingle")
    val filtered = graft.Caches.stage(
      rows.join(broadcast(stopShingles), Seq("shingle"), "left_anti"))
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    filtered.as("a")
      .join(filtered.as("b"), col("a.shingle") === col("b.shingle")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("set_size", "size_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("set_size", "size_b"), Seq("id_b"))
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxShingleFreq: Int = 1000): DataFrame =
    ngramCandidateStats(df, idCol, textCol, n, maxShingleFreq)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Asymmetric CONTAINMENT pairs: for docs sharing ≥1 kept shingle,
    * containment_ab = |A∩B| / |A| (the fraction of a's shingle set inside
    * b's) and the mirror containment_ba. Catches near-SUPERSET relations —
    * a quote, an excerpt, a doc embedded in a larger one — which symmetric
    * Jaccard under-scores (a 100-shingle doc fully contained in a
    * 10,000-shingle doc has Jaccard ≈ 0.01 but containment 1.0). Kept if
    * EITHER direction clears `threshold`. Same candidate discipline as
    * [[ngramJaccardPairs]] — and, like it, both the intersection AND the
    * set sizes are measured over KEPT shingles, so a contained excerpt
    * whose only dropped shingles are boilerplate still scores 1.0.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9,
                       maxShingleFreq: Int = 1000): DataFrame =
    ngramCandidateStats(df, idCol, textCol, n, maxShingleFreq)
      .withColumn("containment_ab", col("inter").cast("double") / col("size_a"))
      .withColumn("containment_ba", col("inter").cast("double") / col("size_b"))
      .filter(col("containment_ab") >= threshold ||
        col("containment_ba") >= threshold)
      .select("id_a", "id_b", "containment_ab", "containment_ba")

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** 2^31 - 1: modulus small enough that a*h + b never overflows a Long
    * under ANSI arithmetic (a, b, h < 2^31 so a*h < 2^62).
    */
  private val MersennePrime31 = 2147483647L

  /** MinHash signature: array of `numHashes` minima of affine permutations
    * (mod 2^31-1) of the shingle hashes. Per-permutation constants are
    * hash-derived from the permutation index — deterministic on every
    * executor, no RNG state.
    *
    * IMPORTANT: this Column form inlines the shingle expression once per
    * hash — fine for tests, quadratic for pipelines. Production paths go
    * through `withMinhashSignature`, which stages the token/shingle/hash
    * arrays as projection columns so each is computed once per row (a
    * 64-hash signature over a 5k-doc corpus went from ~430 s to seconds).
    */
  /** splitmix64 — deterministic per-permutation constant derivation. */
  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (a_i, b_i) affine constants for permutation i — pure Scala, identical
    * in the Column and UDF signature forms.
    */
  private def affineConstants(numHashes: Int): Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      val a = (splitmix(2L * i + 1) & Long.MaxValue) % (MersennePrime31 - 1) + 1
      val b = (splitmix(2L * i + 2) & Long.MaxValue) % MersennePrime31
      (a, b)
    }

  def minhashSignature(text: Column, n: Int = 3, numHashes: Int = 64): Column =
    signatureFromHashes(transform(shingles(text, n),
      s => pmod(xxhash64(s), lit(MersennePrime31))), numHashes)

  private def signatureFromHashes(hs: Column, numHashes: Int): Column = {
    val p = lit(MersennePrime31)
    array(affineConstants(numHashes).map { case (a, b) =>
      when(size(hs) > 0,
        array_min(transform(hs, h => pmod(h * a + b, p))))
        .otherwise(lit(null).cast("long"))
    }: _*)
  }

  /** Tight-loop UDF form: tokens -> shingles -> xxhash64 -> 64-way
    * multiply-mod-min, all in one JVM loop. Bit-identical to the Column
    * form (asserted in DedupSpec): shingles are the same space-joined
    * n-grams de-duplicated as strings, and hashing calls Spark's own
    * XXH64 with the SQL `xxhash64` seed (42) over UTF-8 bytes. Moving the
    * shingle/hash stages out of interpreted higher-order functions (which
    * never enter whole-stage codegen and re-allocate per element) is what
    * the production path pays for: 5k docs went ~13 s staged-HOF ->
    * sub-second here.
    */
  private def minhashFromTokensUdf(n: Int, numHashes: Int) = {
    val consts = affineConstants(numHashes)
    udf((rawToks: Seq[String]) => {
      // the input is the raw codegen'd split: compact out empty tokens
      // here instead of an interpreted filter() HOF stage
      val toks = if (rawToks == null) null else rawToks.filter(_.nonEmpty)
      if (toks == null || toks.isEmpty) null
      else {
        val t = toks.toArray
        val seen = new java.util.HashSet[String]()
        val hashes = new scala.collection.mutable.ArrayBuffer[Long](t.length)
        def addShingle(s: String): Unit = if (seen.add(s)) {
          val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              b.length, 42L)
          hashes += ((h % MersennePrime31) + MersennePrime31) % MersennePrime31
        }
        if (t.length >= n) {
          val sb = new java.lang.StringBuilder()
          var i = 0
          while (i + n <= t.length) {
            sb.setLength(0)
            var j = 0
            while (j < n) { if (j > 0) sb.append(' '); sb.append(t(i + j)); j += 1 }
            addShingle(sb.toString)
            i += 1
          }
        } else addShingle(t.mkString(" "))
        val out = new Array[Long](numHashes)
        var k = 0
        while (k < numHashes) {
          val a = consts(k)._1; val b = consts(k)._2
          var min = Long.MaxValue
          var j = 0
          while (j < hashes.length) {
            val v = (hashes(j) * a + b) % MersennePrime31
            if (v < min) min = v
            j += 1
          }
          out(k) = min
          k += 1
        }
        out
      }
    })
  }

  /** Staged signature computation: the token array is a real projection
    * column (split is codegen'd) and everything downstream runs in
    * `minhashFromTokensUdf`'s JVM loop. This is the production path.
    */
  def withMinhashSignature(df: DataFrame, textCol: String, sigCol: String,
                           n: Int = 3, numHashes: Int = 64): DataFrame =
    df.withColumn("__mh_toks", split(lower(col(textCol)), "\\s+"))
      .withColumn(sigCol, minhashFromTokensUdf(n, numHashes)(col("__mh_toks")))
      .drop("__mh_toks")

  /** (doc_id, sig, band, band_hash) band-bucket rows from a precomputed
    * signature frame — THE band-hash definition, shared by the in-memory
    * LSH path, the persisted signature store and the probe (a drifted
    * copy would silently make stores and probes disagree on every hash).
    */
  private def bandBucketsFromSigs(sigs: DataFrame, numHashes: Int,
                                  bands: Int): DataFrame = {
    val r = numHashes / bands
    sigs.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(slice(col("sig"), b * lit(r) + 1, lit(r)), ",")))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** LSH band buckets: signature chunked into `bands` bands of
    * `numHashes/bands` rows; docs sharing any (band_idx, band_hash) bucket
    * are candidates. Classic banding: threshold ≈ (1/b)^(1/r).
    */
  def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame =
    bandBucketsFromSigs(
      withMinhashSignature(
        df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        "__text", "sig", n, numHashes).drop("__text"),
      numHashes, bands)

  /** Near-duplicate pairs via MinHash LSH: candidates from shared band
    * buckets, verified by estimated Jaccard (signature agreement rate).
    *
    * Scale discipline (the naive bucket self-join is the classic blowup):
    *  1. buckets larger than `maxBucketSize` are dropped before pairing —
    *     degenerate buckets (boilerplate/near-constant text) would
    *     contribute O(n²) candidates; real near-dups still meet in their
    *     other, rarer bands;
    *  2. the candidate join carries only (id_a, id_b) — the 64-hash
    *     signatures are re-attached AFTER pair dedup, so the wide arrays
    *     never ride through the exploding join.
    */
  /** (persisted signature table, deduped candidate id-pairs) — the shared
    * first half of the LSH dataflow, also exposed to the scale-stress
    * bench via [[minhashCandidates]].
    */
  private def minhashSigsAndCandidates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int,
      maxBucketSize: Int): (DataFrame, DataFrame) = {
    // signatures feed bucket explosion AND both verify joins: persist so
    // the (expensive) signature computation runs once, not per consumer.
    // Staged (not bare persist) so harness loops release it between
    // queries — a bare persist here leaks for the JVM's lifetime.
    val sigs = graft.Caches.stage(withMinhashSignature(
      df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "__text", "sig", n, numHashes).drop("__text"))
    val buckets = bandBucketsFromSigs(sigs, numHashes, bands)
      .select("doc_id", "band", "band_hash")
    // degenerate-bucket guard as a broadcast ANTI join on the drop list:
    // buckets OVER the cap are few at any scale (near-constant text),
    // while a keep list is ≈ all buckets — corpus-sized, not
    // broadcastable at 100 TB. Singleton buckets need no pruning: the
    // a.doc_id < b.doc_id self-join yields nothing for them.
    val degenerate = buckets.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > maxBucketSize)
      .select("band", "band_hash")
    // staged (r19): the LSH self-join consumes `pruned` on BOTH sides —
    // un-cached, the band explosion + anti join re-derived per side (and
    // once more for the degenerate scan). docs×bands rows, the banded
    // working set; harness sweeps release it.
    val pruned = graft.Caches.stage(buckets
      .join(broadcast(degenerate), Seq("band", "band_hash"), "left_anti")
      .select("doc_id", "band", "band_hash"))
    val cands = pruned.as("a")
      .join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    (sigs, cands)
  }

  /** Candidate id-pairs after band-bucketing + degenerate-bucket pruning —
    * the quantity the `maxBucketSize` knob must keep near-linear in corpus
    * size (the scale-stress bench measures exactly this at 1× vs 10×).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                        maxBucketSize: Int = 200): DataFrame =
    minhashSigsAndCandidates(df, idCol, textCol, n, numHashes, bands,
      maxBucketSize)._2

  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8,
                      maxBucketSize: Int = 200): DataFrame = {
    val (sigs, cands) = minhashSigsAndCandidates(df, idCol, textCol,
      n, numHashes, bands, maxBucketSize)
    // Re-attach signatures with plain shuffle joins on id: the signature
    // table is full-corpus-sized (one 64-long array per document), so a
    // broadcast hint here would ship multi-TB at scale. AQE still picks a
    // broadcast join at test scale when the side is genuinely small.
    cands
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          x => x)).cast("double") / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // ------------------------------------------------------------------
  // Incremental MinHash dedup (persisted signature store)
  // ------------------------------------------------------------------

  /** Build/extend the persisted MinHash signature store — the state an
    * INCREMENTAL dedup needs to check future batches without ever
    * re-reading (or re-hashing) the historical corpus, and without ever
    * re-SCANNING the historical signatures either: every store table is
    * disk-partitioned on a key the probe can prune on, so a batch probe
    * reads only batch-keyed slices.
    *
    * Layout (three tables, nothing stored or shuffled redundantly; the
    * sigs and buckets tables are IMMUTABLE PER-APPEND SEGMENTS — each
    * append claims a fresh segment id S via an atomic rename-claim in
    * `path/_claims/seg-S` and writes ONLY under its own `seg-S` dirs,
    * never into dirs a reader can already see; the live segment list is
    * committed by the manifest below, Lucene/FtsStore-style):
    *  - `path/sigs/seg-S/sid=K`: one (doc_id, sig) row per document,
    *    sid = pmod(xxhash64(doc_id), storeParts) — the probe's signature
    *    re-attach prunes to the candidate ids' sid partitions, unioned
    *    across the live segments;
    *  - `path/buckets/seg-S/band=B/hmod=M`: bare (doc_id, band_hash)
    *    rows, hmod = pmod(band_hash, storeParts) — the probe's candidate
    *    join prunes to the batch's (band, hmod) partitions per segment;
    *  - `path/stats/v=S/band=B/hmod=M`: MERGED (band_hash, cnt) bucket
    *    populations, version-keyed on the writing append's segment id S.
    *    Version dir S holds ONLY the partitions rewritten by that
    *    append; the manifest maps every live (band, hmod) partition to
    *    the version dir holding its current counts. The merge is
    *    therefore PARTITION-LOCAL: an append reads and rewrites only the
    *    batch-touched partitions' stats — O(batch keys), never O(total
    *    distinct buckets) — and untouched partitions carry forward by
    *    manifest reference alone. The stats table is what lets
    *    [[dedupAgainstStore]] build its degenerate-bucket drop list
    *    WITHOUT re-counting the full bucket table per batch.
    *
    * THE COMMIT POINT is `path/stats/manifest-N` (highest N wins): one
    * write-once file carrying the live segment list AND the stats
    * routing map, claimed by tmp-write + conditional rename — renaming
    * onto an existing file is refused on local fs and HDFS alike, so
    * each manifest number has exactly one owner. Until an append's
    * manifest lands, NOTHING it wrote is reachable: its segment dirs and
    * stats version dir are unreferenced names no reader resolves. A
    * crashed (or racing, see below) append therefore leaves the store
    * bit-for-bit at its pre-append state plus some orphaned dirs that
    * the next compaction grace-sweeps.
    *
    * `storeParts` is the store's partition granularity — fixed at store
    * creation and sized to the expected corpus like any partition count:
    * per-partition bucket rows ≈ corpus×bands/(bands×storeParts); pick
    * storeParts so that stays a few hundred MB (e.g. 4096 at 100 TB).
    * Probe cost is then O(batch-touched partitions), independent of total
    * store size. The creation-time parameters (n, numHashes, bands,
    * storeParts) are persisted in `path/meta.json` and REQUIRED to match
    * on every later append/probe — a mismatched probe would compute
    * partition paths that don't exist and silently skip them, losing real
    * duplicates. Append-mode: each ingested batch adds its rows. Doc ids
    * must be unique across ALL appended batches (they key the signature
    * lookup).
    *
    * '''Recorded decision — single-writer THROUGHPUT, first-committer
    * CORRECTNESS.''' A signature-store append is a READ-MODIFY-WRITE of
    * the stats routing: it merges the batch's counts against the
    * manifest it read. Nearly every batch touches a large share of the
    * stats partitions (band hashes spray uniformly by construction), so
    * concurrent appends conflict near-always and optimistic retries
    * would churn without progress — concurrent ingest belongs UPSTREAM
    * (shard batches per store, or ride
    * [[graft.streaming.Streams.streamDedupAgainstStore]], whose
    * checkpoint serializes micro-batches for free). The `_lock` file
    * encodes that contract as a FAST, COURTEOUS failure for a
    * well-behaved concurrent writer or a crashed writer's stale lock.
    * But the lock's create is not atomic on LocalFileSystem/S3-class
    * stores (the documented [[graft.StoreLock]] TOCTOU), so CORRECTNESS
    * never rests on it: a writer that slips past the lock still writes
    * only its own claimed segment dirs and must win the conditional
    * manifest rename for `manifest-(readBase+1)` to publish. Exactly
    * one racer owns that name, and the loser — whose merge could have
    * missed the winner's counts — dies loudly BEFORE anything it wrote
    * becomes reachable: no silent half-merge, no partial state in any
    * live dir, on any filesystem with atomic rename. DedupSpec pins it
    * with a genuinely racing appender pair: losers fail loud (lock or
    * manifest claim), and the store's readable state equals exactly the
    * seed plus the successful appends.
    */
  def appendSignatureStore(df: DataFrame, idCol: String, textCol: String,
                           path: String, n: Int = 3, numHashes: Int = 64,
                           bands: Int = 16, storeParts: Int = 16): Unit = {
    val spark = df.sparkSession
    val fs = hadoopFs(spark, path)
    withStoreLock(fs, path) {
      checkOrWriteMeta(fs, path, n, numHashes, bands, storeParts)
      // the manifest read is the transaction BASE: the commit below
      // claims manifest-(mv+1), so it succeeds only if no other writer
      // committed since this read — first-committer-wins on the merge
      val (mv, liveSegs, manifest) = readStatsManifest(spark, path)
      // claim a fresh segment id; every byte this append writes lands
      // under seg-$seg / stats/v=$seg — dirs no reader can resolve until
      // the manifest commit publishes them
      val seg = claimSeg(fs, path)
      val sigs = graft.Caches.stage(withMinhashSignature(
        df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        "__text", "sig", n, numHashes).drop("__text"))
      // repartition ON the partition columns before every partitionBy write:
      // without it each of the shuffle-partition tasks writes a file into
      // EVERY partition dir (tasks × bands × storeParts tiny files); with it
      // each output dir is written by exactly one task
      sigs.withColumn("sid",
          pmod(xxhash64(col("doc_id")), lit(storeParts.toLong)).cast("int"))
        .repartition(col("sid"))
        .write.partitionBy("sid").parquet(s"$path/sigs/seg-$seg")
      // the (band, hmod) arrangement lives INSIDE the staged frame (r19):
      // the bucket write, the batch-counts aggregation, and the touched-
      // key distinct below all need exactly this clustering, so they all
      // reuse the cache's HashPartitioning(band, hmod) instead of each
      // paying its own exchange (the aggregations' grouping keys are a
      // superset of the partitioning keys)
      val buckets = graft.Caches.stage(bandBucketsFromSigs(sigs, numHashes, bands)
        .select("doc_id", "band", "band_hash")
        .withColumn("hmod",
          pmod(col("band_hash"), lit(storeParts.toLong)).cast("int"))
        .repartition(col("band"), col("hmod")))
      buckets.write.partitionBy("band", "hmod")
        .parquet(s"$path/buckets/seg-$seg")
      // PARTITION-LOCAL stats merge: previous counts are read from ONLY
      // the batch-touched (band, hmod) partitions (via the manifest, so
      // even directory listing is O(batch keys)), merged with the batch's
      // counts, and written as version N+1 containing ONLY those
      // partitions. Untouched partitions are never read, shuffled, or
      // rewritten — their manifest entries carry forward. This keeps the
      // append O(batch), matching the probe: a per-micro-batch streaming
      // ingest no longer pays an O(store) stats rewrite as the corpus
      // grows (at 100 TB the full stats table is itself TB-scale).
      val batchCounts = buckets.groupBy("band", "hmod", "band_hash")
        .agg(count(lit(1)).as("cnt"))
      val touched = buckets.select("band", "hmod").distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      val prevTouched = touched.toSeq.flatMap { case (b, m) =>
        manifest.get((b, m)).map(v => (v, b, m)) }
      // merge with ONE exchange (r19): repartition the union by the
      // write layout's keys FIRST, so the (band, hmod, band_hash) merge
      // aggregation reuses that clustering and the partitionBy write
      // below needs no second shuffle; with no prior counts, batchCounts
      // already carries the cache's (band, hmod) partitioning — zero
      // additional exchanges
      val merged = statsUnionRead(spark, path, prevTouched) match {
        case Some(prev) => prev.unionByName(batchCounts)
          .repartition(col("band"), col("hmod"))
          .groupBy("band", "hmod", "band_hash").agg(sum("cnt").as("cnt"))
        case None => batchCounts
      }
      // the stats version dir is keyed on the CLAIMED segment id — a
      // name this writer exclusively owns, so even a lock-escaping racer
      // can never write into another append's stats dir
      merged.write.partitionBy("band", "hmod")
        .parquet(s"$path/stats/v=$seg")
      // COMMIT: one conditional-rename manifest claim publishes the new
      // segment AND the re-routed stats in a single atomic cut-over;
      // until it lands, readers see the previous manifest and none of
      // this append's dirs. The touched keys' previous stats homes
      // become unreferenced here but are RETAINED — a probe that
      // resolved them through the pre-append manifest must still find
      // them, INCLUDING through this append's successor compaction (the
      // sweep honors every retained manifest generation, so these dirs
      // die only two compactions later). Until then they are bounded
      // garbage, one superseded copy per touched key per append since
      // the last compaction.
      if (!tryWriteStatsManifest(fs, path, mv + 1, liveSegs :+ seg,
          manifest ++ touched.map(_ -> seg).toMap))
        throw new IllegalStateException(
          s"signature store at $path is SINGLE-WRITER and another append " +
            s"committed manifest-${mv + 1} first (this writer slipped " +
            "past the lock on a non-atomic-create filesystem) — aborting " +
            "WITHOUT publishing: this append's merge was computed against " +
            "a stale base and none of its files are reachable; re-run it.")
    }
  }

  /** Offline maintenance for a long-lived signature store: each append
    * lands one segment (one file per touched partition) and one stats
    * version dir, so after many increments a probe unions one slice per
    * segment and the stats table is scattered over many versions.
    * Compaction rewrites all live segments' sigs and buckets into ONE
    * fresh segment (one file per partition) and consolidates the live
    * stats partitions into ONE fresh version, then commits a manifest
    * referencing only the packed copies. Deliberately O(store) — it's
    * the amortized maintenance job, run between ingests, never on the
    * probe path. Takes the same single-writer `_lock` as appends, and
    * like them publishes through the conditional manifest claim, so a
    * compaction racing a lock-escaping append fails loud instead of
    * silently dropping the append's segment.
    *
    * READER-SAFE BY CONSTRUCTION, never by rename: the packed segment
    * and stats land under a freshly CLAIMED id beside the live dirs and
    * the write-once manifest is the atomic cut-over, so no path a
    * reader could have resolved is ever renamed or briefly absent. All
    * sweeps are DEFERRED: a segment or stats version dir is deleted
    * only when NO retained manifest references it (manifest files are
    * retained two generations past the live one), giving a reader that
    * resolved paths through the latest metadata TWO full writer
    * generations of headroom — including the documented worst case, a
    * probe planned before an append and still executing through that
    * append's successor compaction (asserted by interleaving in
    * DedupSpec). Three-plus generations of writers inside one probe is
    * sequential-ingest territory the operating model excludes.
    * Unreferenced dirs that no manifest ever published (a crashed or
    * race-losing append's claimed segment) are swept too, past
    * `orphanGraceMs` — the grace keeps a hypothetical in-flight writer's
    * staging intact.
    *
    * Crash-safe in every window: a packed segment written but not
    * manifest-committed is an orphan the next compaction grace-sweeps;
    * a committed manifest whose sweep never ran just leaves deferred
    * garbage for the next cycle.
    */
  def compactSignatureStore(spark: org.apache.spark.sql.SparkSession,
                            path: String,
                            orphanGraceMs: Long = 3600000L): Unit = {
    val fs = hadoopFs(spark, path)
    withStoreLock(fs, path) {
      val (mv, liveSegs, manifest) = readStatsManifest(spark, path)
      if (liveSegs.nonEmpty || manifest.nonEmpty) {
        val seg = claimSeg(fs, path)
        def rewriteInto(sub: String, parts: Seq[String]): Boolean = {
          val srcs = liveSegs.map(s => s"$path/$sub/seg-$s")
            .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
          if (srcs.isEmpty) false
          else {
            // per-segment reads unioned (not one multi-root read): each
            // segment dir is its own basePath, keeping the partition
            // columns parsed per segment
            srcs.map(spark.read.parquet(_)).reduce(_ unionByName _)
              .repartition(parts.map(col): _*)
              .write.partitionBy(parts: _*)
              .parquet(s"$path/$sub/seg-$seg")
            true
          }
        }
        val wroteSigs = rewriteInto("sigs", Seq("sid"))
        val wroteBuckets = rewriteInto("buckets", Seq("band", "hmod"))
        val packedStats = manifest.nonEmpty && {
          val all = manifest.toSeq.map { case ((b, m), v) => (v, b, m) }
          statsUnionRead(spark, path, all).exists { live =>
            live.repartition(col("band"), col("hmod"))
              .write.partitionBy("band", "hmod")
              .parquet(s"$path/stats/v=$seg")
            true
          }
        }
        val newSegs = if (wroteSigs || wroteBuckets) Seq(seg) else Seq.empty
        val newMap =
          if (packedStats) manifest.map { case (k, _) => k -> seg }
          else manifest
        if (!tryWriteStatsManifest(fs, path, mv + 1, newSegs, newMap))
          throw new IllegalStateException(
            s"signature store at $path is SINGLE-WRITER and another " +
              s"writer committed manifest-${mv + 1} during this " +
              "compaction — aborting WITHOUT publishing; the packed " +
              "copies are unreferenced and will be grace-swept; re-run.")
      }
      sweepSigStore(fs, path, orphanGraceMs)
    }
  }

  /** Deferred sweep (under the store lock): delete segment dirs, stats
    * version dirs and claim markers referenced by NO retained manifest
    * (the live one plus two predecessors) — but never younger than
    * `orphanGraceMs`, so a writer between its claim and its commit keeps
    * its staging. Claim markers are swept only after their dirs are
    * gone; ids are never reused while any trace of them exists.
    */
  private def sweepSigStore(fs: org.apache.hadoop.fs.FileSystem,
                            path: String, orphanGraceMs: Long): Unit = {
    val retained = manifestFiles(fs, path).map(_._2).map(readManifestFile(fs, _))
    val keepSegs = retained.flatMap(_._1).toSet
    val keepStats = retained.flatMap(_._2.values).toSet
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    def sweepDirs(base: String, prefix: String, keep: Set[Int]): Unit = {
      val b = new org.apache.hadoop.fs.Path(base)
      if (fs.exists(b)) fs.listStatus(b).filter(_.isDirectory).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith(prefix))
          scala.util.Try(nm.drop(prefix.length).toInt).toOption.foreach { id =>
            if (!keep.contains(id) && st.getModificationTime < cutoff)
              fs.delete(st.getPath, true)
          }
      }
    }
    sweepDirs(s"$path/sigs", "seg-", keepSegs)
    sweepDirs(s"$path/buckets", "seg-", keepSegs)
    sweepDirs(s"$path/stats", "v=", keepStats)
    val claims = new org.apache.hadoop.fs.Path(s"$path/_claims")
    if (fs.exists(claims))
      fs.listStatus(claims).filter(_.isFile).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("seg-"))
          scala.util.Try(nm.drop(4).toInt).toOption.foreach { id =>
            val gone = !fs.exists(new org.apache.hadoop.fs.Path(s"$path/sigs/seg-$id")) &&
              !fs.exists(new org.apache.hadoop.fs.Path(s"$path/buckets/seg-$id")) &&
              !fs.exists(new org.apache.hadoop.fs.Path(s"$path/stats/v=$id"))
            if (!keepSegs.contains(id) && !keepStats.contains(id) && gone &&
                st.getModificationTime < cutoff)
              fs.delete(st.getPath, false)
          }
      }
  }

  // ---- signature-store metadata / manifest / lock plumbing -----------

  /** Per-store JVM monitor: in-process writers serialize the tiny
    * metadata-only claim step (the exact same-JVM races the filesystem's
    * conditional rename also catches); cross-process exclusion rests on
    * the rename alone. Same discipline as [[graft.fts.FtsStore]].
    */
  private val claimMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def claimMonitor(path: String): Object =
    claimMonitors.computeIfAbsent(path, _ => new Object)

  /** Claim an exclusive segment id: conditionally rename a marker into
    * `path/_claims/seg-N` — renaming onto an existing file is refused
    * (local fs and HDFS alike), so each id has at most one owner and two
    * writers can never build the same `seg-N` (or `stats/v=N`) dirs.
    * Crashed claims merely burn numbers; markers are grace-swept with
    * their dirs by [[sweepSigStore]].
    */
  private def claimSeg(fs: org.apache.hadoop.fs.FileSystem,
                       path: String): Int =
    claimMonitor(path).synchronized {
      val claimsDir = new org.apache.hadoop.fs.Path(s"$path/_claims")
      if (!fs.exists(claimsDir)) fs.mkdirs(claimsDir)
      def ids(base: String, prefix: String): Set[Int] = {
        val b = new org.apache.hadoop.fs.Path(base)
        if (!fs.exists(b)) Set.empty
        else fs.listStatus(b).toSeq.map(_.getPath.getName)
          .collect { case n if n.startsWith(prefix) =>
            scala.util.Try(n.drop(prefix.length).toInt).toOption }
          .flatten.toSet
      }
      val taken = ids(s"$path/_claims", "seg-") ++
        ids(s"$path/sigs", "seg-") ++ ids(s"$path/buckets", "seg-") ++
        ids(s"$path/stats", "v=")
      var n = (taken + -1).max + 1
      var attempts = 0
      while (attempts < 1000) {
        attempts += 1
        val tmp = new org.apache.hadoop.fs.Path(s"$path/_claims/" +
          f".claim.${scala.util.Random.nextInt(0x10000)}%04x.tmp")
        fs.create(tmp, false).close()
        if (fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$path/_claims/seg-$n")))
          return n
        try fs.delete(tmp, false)
        catch { case _: java.io.IOException => () }
        n += 1
      }
      throw new IllegalStateException(
        s"segment claim at $path lost 1000 straight races — aborting")
    }

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession,
                       path: String): org.apache.hadoop.fs.FileSystem =
    graft.StoreLock.fs(spark, path)

  /** Single-writer guard — the token read-back protocol lives in
    * [[graft.StoreLock.withLock]]; see its scaladoc for the atomicity
    * caveat on non-HDFS filesystems.
    *
    * The lock is the store's THROUGHPUT contract, not its correctness:
    * appends are stats read-modify-writes that would conflict
    * near-always under optimistic retries (band hashes spray uniformly),
    * so a second writer fails fast here instead of churning. Correctness
    * rests on the claimed-segment + conditional-manifest-rename protocol
    * (see [[appendSignatureStore]]): a writer that slips past this lock
    * on a non-atomic-create filesystem still cannot publish a stale
    * merge or touch a live dir. A crashed writer's stale lock fails the
    * next append loudly with removal instructions — the documented
    * recovery.
    */
  private def withStoreLock[T](fs: org.apache.hadoop.fs.FileSystem,
                               path: String)(body: => T): T =
    graft.StoreLock.withLock(fs, path, "signature store")(body)

  /** Creation-time store parameters, pinned in `path/meta.json`: a probe
    * or append with different values would compute partition paths that
    * simply don't exist, and the pruned reads would SILENTLY skip them —
    * returning incomplete dup pairs. With the pin, the mismatch is a
    * require() failure at the call site instead of silent data loss.
    */
  private def checkOrWriteMeta(fs: org.apache.hadoop.fs.FileSystem, path: String,
                               n: Int, numHashes: Int, bands: Int,
                               storeParts: Int): Unit =
    readMeta(fs, path) match {
      case Some(m) => requireMetaMatch(path, m, n, numHashes, bands, storeParts)
      case None =>
        val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
        val out = fs.create(p, false)
        try out.write(
          (s"""{"n":$n,"numHashes":$numHashes,"bands":$bands,""" +
            s""""storeParts":$storeParts}""" + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
    }

  private def requireMetaMatch(path: String, m: Map[String, Int], n: Int,
                               numHashes: Int, bands: Int, storeParts: Int): Unit = {
    val passed = Map("n" -> n, "numHashes" -> numHashes, "bands" -> bands,
      "storeParts" -> storeParts)
    require(m == passed,
      s"signature store at $path was created with $m but called with " +
        s"$passed — mismatched parameters would silently skip real " +
        "duplicates (partition paths would not resolve); pass the " +
        "creation-time values from meta.json")
  }

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem,
                       path: String): Option[Map[String, Int]] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some("\"(\\w+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(txt)
        .map(g => g.group(1) -> g.group(2).toInt).toMap)
    }
  }

  /** The live manifest:
    * `(latestManifestNumber, liveSegmentIds, (band, hmod) -> statsVersion)`.
    * `stats/manifest-N` files are write-once; the highest N wins, so a
    * manifest write is an atomic commit (a crashed append leaves the old
    * manifest in charge and its segment/stats dirs unreferenced).
    * (0, empty, empty) for a store with no commits yet.
    */
  private[graft] def readStatsManifest(spark: org.apache.spark.sql.SparkSession,
                                       path: String): (Int, Seq[Int], Map[(Int, Int), Int]) = {
    val fs = hadoopFs(spark, path)
    manifestFiles(fs, path).sortBy(-_._1).headOption match {
      case None =>
        // stats version dirs WITHOUT any manifest are not "empty stats":
        // treating them that way would silently discard every
        // accumulated bucket count. Two ways here: a store written by a
        // pre-manifest layout, or a first append that crashed between
        // its stats write and its manifest commit (the crash also
        // leaves _lock behind, so the operator has already intervened
        // once to get this far). Both want an explicit decision, not
        // silent stats loss.
        val base = new org.apache.hadoop.fs.Path(s"$path/stats")
        if (fs.exists(base) && fs.listStatus(base)
            .exists(st => st.isDirectory && st.getPath.getName.startsWith("v=")))
          throw new IllegalStateException(
            s"signature store at $path has stats version dirs but no " +
              "manifest — either a pre-manifest-layout store or a crashed " +
              "first append. Rebuild the store (or remove stats/ to reset " +
              "the counts) rather than letting the bucket populations " +
              "silently read as zero.")
        (0, Seq.empty, Map.empty)
      case Some((v, p)) =>
        val (segs, stats) = readManifestFile(fs, p)
        (v, segs, stats)
    }
  }

  /** Parse one manifest file: first line `segs:<id>,<id>,...`, then one
    * `band,hmod,statsVersion` routing line per live stats partition.
    */
  private def readManifestFile(fs: org.apache.hadoop.fs.FileSystem,
                               p: org.apache.hadoop.fs.Path)
      : (Seq[Int], Map[(Int, Int), Int]) = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = txt.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith("segs:")),
      s"signature-store manifest $p predates the segment layout — " +
        "rebuild the store")
    val segs = lines.head.drop("segs:".length)
      .split(",").filter(_.nonEmpty).map(_.toInt).toSeq
    val stats = lines.tail.map { line =>
      val parts = line.split(",")
      ((parts(0).toInt, parts(1).toInt), parts(2).toInt)
    }.toMap
    (segs, stats)
  }

  private def manifestFiles(fs: org.apache.hadoop.fs.FileSystem,
                            path: String): Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val base = new org.apache.hadoop.fs.Path(s"$path/stats")
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isFile).flatMap { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("manifest-"))
        scala.util.Try(nm.drop("manifest-".length).toInt).toOption
          .map(_ -> st.getPath)
      else None
    }
  }

  /** The COMMIT: write-to-temp + CONDITIONAL rename. The rename is both
    * the atomic content point (a reader never sees a half-written
    * commit — a dot-prefixed temp never matches the manifest- scan) and
    * the first-committer-wins claim: renaming onto an existing
    * `manifest-N` is refused on local fs and HDFS alike, so at most one
    * writer owns each number and a writer whose base manifest went stale
    * learns it HERE, before anything it wrote becomes reachable. Returns
    * whether this writer won; a loss leaves no litter in live dirs.
    * Object stores without atomic rename need an external committer —
    * the standard lakehouse caveat.
    */
  private def tryWriteStatsManifest(fs: org.apache.hadoop.fs.FileSystem,
                                    path: String, n: Int, segs: Seq[Int],
                                    entries: Map[(Int, Int), Int]): Boolean = {
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats")
    if (!fs.exists(statsDir)) fs.mkdirs(statsDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/stats/.manifest-$n." +
      f"${scala.util.Random.nextInt(0x10000)}%04x.tmp")
    val p = new org.apache.hadoop.fs.Path(s"$path/stats/manifest-$n")
    val out = fs.create(tmp, false)
    try out.write((s"segs:${segs.sorted.mkString(",")}\n" +
      entries.toSeq.sortBy(_._1)
        .map { case ((b, m), v) => s"$b,$m,$v" }.mkString("", "\n", "\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      try fs.delete(tmp, false) catch { case _: Throwable => () }
      return false
    }
    // retain TWO superseded manifests: the compaction sweep keeps every
    // dir any retained manifest references, so paths a probe resolved
    // through the latest metadata survive two full writer generations
    // (readers always take the highest, so retained predecessors change
    // nothing they can see)
    manifestFiles(fs, path).filter(_._1 < n - 2)
      .foreach { case (_, f) => try fs.delete(f, false) catch { case _: Throwable => () } }
    true
  }

  /** Union-read of specific live stats partitions `(version, band, hmod)`,
    * grouped per owning version so each read keeps its basePath-derived
    * partition columns. None when `parts` is empty.
    */
  private def statsUnionRead(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             parts: Seq[(Int, Int, Int)]): Option[DataFrame] =
    parts.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, keys) =>
      spark.read.option("basePath", s"$path/stats/v=$v")
        .parquet(keys.map { case (_, b, m) => s"$path/stats/v=$v/band=$b/hmod=$m" }: _*)
        .select("band", "hmod", "band_hash", "cnt")
    }.reduceOption(_ unionByName _)

  /** Near-dup pairs of a NEW batch against the persisted store (plus the
    * batch against itself): the incremental form of [[minhashDupPairs]].
    * Three scale disciplines make the probe O(batch), not O(store):
    *
    *  1. PARTITION-PRUNED store reads — the batch's distinct (band, hmod)
    *     keys (≤ batch×bands rows, collected; bounded by contract — a
    *     batch is an increment) ENUMERATE the partition directories the
    *     probe reads from the bucket AND stats tables, so both the scan
    *     and the driver's file listing touch only batch-keyed slices; the
    *     signature re-attach likewise prunes `sigs` to the candidate ids'
    *     sid partitions. Nothing store-sized is ever scanned OR listed.
    *  2. The degenerate-bucket cap comes from the persisted STATS table
    *     (store-side populations merged at append time) plus the batch's
    *     own counts — dropping over-cap (band, band_hash) buckets from
    *     both sides without re-counting the store. Store-only degenerate
    *     buckets the batch never touches are irrelevant (no batch key ⇒
    *     no candidate pair), so pruning the stats read to batch keys
    *     loses nothing.
    *  3. The candidate join carries BARE IDS ONLY; the numHashes-long
    *     signatures are re-attached after pair dedup (a true dup matches
    *     in many bands — shipping signatures through the multi-band join
    *     would shuffle ~bands× the bytes). Batch-side buckets broadcast.
    *
    * `probeRowsRead` (optional instrumentation) receives the row count of
    * the pruned store-bucket scan — the filter is partition-only, so that
    * count IS the number of store bucket rows read from disk (the
    * O(batch) claim, measurable; DedupSpec asserts it). Measured as an
    * eager count of the pruned scan rather than an `observe` on the probe
    * plan: the candidate frame is staged (cached), and Spark completes an
    * Observation with an EMPTY row when the first finishing query carries
    * the CollectMetrics node only below an InMemoryTableScan boundary —
    * a race the eager count sidesteps deterministically.
    *
    * Returns (store_id, batch_id, est_jaccard); batch-internal pairs
    * appear as (id_a, id_b) under the same columns. Callers then
    * [[appendSignatureStore]] the deduped batch. All four store
    * parameters must match the creation-time values pinned in
    * `meta.json` — enforced with a require(), because a mismatch would
    * compute partition paths that don't exist and the pruned reads would
    * silently skip them (missing dup pairs, not an error).
    */
  def dedupAgainstStore(spark: org.apache.spark.sql.SparkSession, path: String,
                        batch: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                        threshold: Double = 0.8,
                        maxBucketSize: Int = 200, storeParts: Int = 16,
                        probeRowsRead: Option[java.util.concurrent.atomic.AtomicLong] = None): DataFrame = {
    val fs = hadoopFs(spark, path)
    readMeta(fs, path)
      .foreach(m => requireMetaMatch(path, m, n, numHashes, bands, storeParts))
    val batchSigs = graft.Caches.stage(withMinhashSignature(
      batch.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "__text", "sig", n, numHashes).drop("__text"))
    // staged pre-clustered on (band, hmod) like the append path (r19):
    // the touched-key distinct and the batch-counts aggregation below
    // both group on supersets of these keys, so they run exchange-free
    // off the cache
    val batchBuckets = graft.Caches.stage(
      bandBucketsFromSigs(batchSigs, numHashes, bands)
        .select("doc_id", "band", "band_hash")
        .withColumn("hmod",
          pmod(col("band_hash"), lit(storeParts.toLong)).cast("int"))
        .repartition(col("band"), col("hmod")))
    // the batch's partition keys, collected to drive pruning: ≤ bands ×
    // storeParts distinct (band, hmod) pairs, and ≤ batch×bands before
    // dedup — driver-side by design, bounded by the batch contract
    val touched = batchBuckets.select("band", "hmod").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // directory-level pruning, not a filter: the probe ENUMERATES the
    // batch-touched (band, hmod) directories and reads only those — even
    // the driver's file LISTING stays O(batch), where a where() over the
    // whole table would list every partition dir of the store first
    def prunedRead(base: String, dirs: Seq[String],
                   emptyLike: DataFrame): DataFrame = {
      val live = dirs.filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      if (live.isEmpty) emptyLike.where(lit(false))
      else spark.read.option("basePath", base).parquet(live: _*)
    }
    // resolve the live manifest ONCE and plan every store read against
    // it: the segment list and stats routing it names stay readable for
    // the whole probe — appends only ADD segments, and the compaction
    // sweep retains every dir any of the last two manifest generations
    // references
    val (_, liveSegs, statsManifest) = readStatsManifest(spark, path)
    def segUnionRead(sub: String, keyDirs: Int => Seq[String],
                     emptyLike: DataFrame): DataFrame =
      liveSegs.map(s => prunedRead(s"$path/$sub/seg-$s", keyDirs(s), emptyLike))
        .reduceOption(_ unionByName _)
        .getOrElse(emptyLike.where(lit(false)))
    val storeBuckets = segUnionRead("buckets",
      s => touched.toSeq.map { case (b, m) =>
        s"$path/buckets/seg-$s/band=$b/hmod=$m" },
      batchBuckets)
      .select("doc_id", "band", "hmod", "band_hash")
    probeRowsRead.foreach(_.set(storeBuckets.count()))
    // cap over the COMBINED population (store stats + batch counts): a
    // bucket can be degenerate purely in the store, purely in the batch,
    // or only once merged
    val batchCounts = batchBuckets.groupBy("band", "hmod", "band_hash")
      .agg(count(lit(1)).as("bcnt"))
    val statsEmpty = batchCounts
      .select(col("band"), col("hmod"), col("band_hash"), col("bcnt").as("cnt"))
    // manifest-routed stats read: each batch-touched key's counts live in
    // exactly the version dir its manifest entry names — O(batch keys)
    // dirs listed and read, like the bucket scan above
    val liveTouched = touched.toSeq.flatMap { case (b, m) =>
      statsManifest.get((b, m)).map(v => (v, b, m)) }
    val storeStats = statsUnionRead(spark, path, liveTouched)
      .getOrElse(statsEmpty.where(lit(false)))
    val degenerate = batchCounts
      .join(storeStats.withColumnRenamed("cnt", "scnt"),
        Seq("band", "hmod", "band_hash"), "left")
      .filter(col("bcnt") + coalesce(col("scnt"), lit(0L)) > maxBucketSize)
      .select("band", "band_hash")
    val prunedStore = storeBuckets
      .join(broadcast(degenerate), Seq("band", "band_hash"), "left_anti")
    val prunedBatch = batchBuckets
      .join(broadcast(degenerate), Seq("band", "band_hash"), "left_anti")
    val cross = prunedStore.as("s")
      .join(broadcast(prunedBatch.as("b")),
        col("s.band") === col("b.band") && col("s.band_hash") === col("b.band_hash"))
      .select(col("s.doc_id").as("store_id"), col("b.doc_id").as("batch_id"))
    val self = prunedBatch.as("a")
      .join(prunedBatch.as("c"),
        col("a.band") === col("c.band") && col("a.band_hash") === col("c.band_hash")
          && col("a.doc_id") < col("c.doc_id"))
      .select(col("a.doc_id").as("store_id"), col("c.doc_id").as("batch_id"))
    // re-attach signatures AFTER pair dedup; the lookup covers store AND
    // batch ids (batch-internal pairs key both sides with batch ids).
    // Candidates are materialized first (staged) so their ids' sid
    // partitions are known — the sigs scan then prunes to those (≤
    // storeParts values collected, trivially bounded).
    val cands = graft.Caches.stage(
      cross.unionByName(self).dropDuplicates("store_id", "batch_id"))
    val sids = cands
      .select(explode(array(col("store_id"), col("batch_id"))).as("doc_id"))
      .select(pmod(xxhash64(col("doc_id")), lit(storeParts.toLong))
        .cast("int").as("sid"))
      .distinct().collect().map(_.getInt(0))
    val storeSigs = segUnionRead("sigs",
      s => sids.toSeq.map(k => s"$path/sigs/seg-$s/sid=$k"),
      batchSigs.withColumn("sid", lit(0)))
    val sigLookup = storeSigs.drop("sid").unionByName(batchSigs)
    cands
      .join(sigLookup.select(col("doc_id").as("store_id"), col("sig").as("sig_a")),
        Seq("store_id"))
      .join(sigLookup.select(col("doc_id").as("batch_id"), col("sig").as("sig_b")),
        Seq("batch_id"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          x => x)).cast("double") / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("store_id", "batch_id", "est_jaccard")
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word tokens: bit b is 1 iff the sum of ±1 votes
    * (sign of token-hash bit b, weighted by term frequency) is positive.
    */
  def simhash(text: Column): Column = {
    val toks = TextStats.wsTokens(lower(text))
    simhashFromHashes(transform(toks, t => xxhash64(t)))
  }

  private def simhashFromHashes(hashes: Column): Column = {
    val bits = transform(sequence(lit(0), lit(63)), { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(call_function("shiftleft", lit(1L), b)) =!= 0, 1L).otherwise(-1L))
      when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Tight-loop UDF simhash: token hashing (Spark's XXH64, SQL seed 42 —
    * bit-identical to the Column form) and the 64 × |tokens| bit votes in
    * one JVM loop (same rationale as minhashFromTokensUdf).
    */
  private val simhashFromTokensUdf = udf((toks: Seq[String]) => {
    if (toks == null) 0L
    else {
      val votes = new Array[Int](64)
      val it = toks.iterator
      while (it.hasNext) {
        val tok = it.next()
        if (tok.nonEmpty) {  // raw split input: skip empty tokens inline
        val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
  })

  /** Staged simhash (see withMinhashSignature for why). */
  def withSimhash(df: DataFrame, textCol: String, sigCol: String): DataFrame =
    df.withColumn("__sh_toks", split(lower(col(textCol)), "\\s+"))
      .withColumn(sigCol, simhashFromTokensUdf(col("__sh_toks")))
      .drop("__sh_toks")

  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming distance <= maxDist. Candidate
    * generation: pigeonhole on 4 × 16-bit chunks — any pair within
    * distance 3 shares at least one exact chunk, so only chunk-bucket
    * joins are evaluated (maxDist > 3 weakens the guarantee; documented).
    */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    val sigs = graft.Caches.stage(withSimhash(
      df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "__text", "sig").drop("__text"))
    hammingPairsFromSigs(sigs, maxDist, maxBucketSize)
  }

  /** Near-dup pairs of PRECOMPUTED 64-bit signatures by hamming distance —
    * the pigeonhole candidate machinery of [[simhashDupPairs]], factored
    * out so ANY 64-bit locality-sensitive signature reuses it unchanged
    * (SimHash over tokens, [[Multimodal.phash64]] over images, …).
    *
    * `sigs` must carry (doc_id, sig); candidates are pairs sharing at
    * least one of the 4 × 16-bit chunks (exhaustive for maxDist <= 3,
    * documented-recall heuristic above), degenerate chunk buckets capped
    * exactly as in MinHash LSH. Returns (id_a, id_b, dist).
    */
  def hammingPairsFromSigs(sigs: DataFrame, maxDist: Int = 3,
                           maxBucketSize: Int = 500): DataFrame =
    hammingCandidatePairs(sigs, maxBucketSize).filter(col("dist") <= maxDist)

  /** The pigeonhole candidate pairs BEFORE the distance filter — the
    * quantity the chunk-bucket cap must keep near-linear in corpus size
    * (counted directly by the scale-stress bench, like every other
    * candidate generator here). Returns (id_a, id_b, dist).
    *
    * KNOB-∝-CORPUS contract, stated exactly: `maxBucketSize` caps
    * SYSTEMATIC crowding (many docs sharing a chunk value), but uniform
    * chance collisions put an irreducible ~n²·(chunks/2^width) floor
    * under the count — 4 × 16-bit chunks ⇒ n²/16384, negligible through
    * ~10⁶ docs and visibly emerging in the 10× stress (13× candidates at
    * 10× size: the linear structured part plus the birthday floor).
    * Beyond that scale the chunk WIDTH must grow with log₂(n):
    * [[simhash128DupPairs]] IS that path (128-bit signatures, 4 × 32-bit
    * chunks ⇒ n²/2^30, negligible through ~10⁹ docs); permuted
    * sorted-prefix tables (Manku et al., WWW'07) are the next rung — the
    * same "resize the knob with the corpus" discipline as storeParts and
    * nClusters, applied to chunk width.
    */
  def hammingCandidatePairs(sigs: DataFrame,
                            maxBucketSize: Int = 500): DataFrame = {
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => call_function("shiftrightunsigned", col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    chunkBucketPairs(chunks, maxBucketSize,
      (a, b) => hammingDist(a, b))
  }

  /** The shared tail of every pigeonhole generator: cap degenerate chunk
    * buckets, self-join within buckets, emit distinct (id_a, id_b, dist).
    * `chunks` carries (doc_id, sig, chunk, chunk_val); `dist` computes
    * hamming distance between two sig columns (whatever their type).
    */
  private def chunkBucketPairs(chunks: DataFrame, maxBucketSize: Int,
                               dist: (Column, Column) => Column): DataFrame = {
    // drop degenerate chunk buckets (same rationale as minhash LSH: a
    // bucket shared by everyone contributes O(n^2) candidates and no
    // signal; real near-dups still collide in their other chunks) —
    // broadcast ANTI join on the tiny over-cap drop list (see
    // minhashDupPairs for why not a keep list)
    val degenerate = chunks.groupBy("chunk", "chunk_val")
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
      .select("chunk", "chunk_val")
    // staged (r19): both self-join sides re-derived the chunk explosion
    // + anti join otherwise (the minhash `pruned` discipline)
    val prunedChunks = graft.Caches.stage(chunks
      .join(broadcast(degenerate), Seq("chunk", "chunk_val"), "left_anti"))
    prunedChunks.as("a")
      .join(prunedChunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        dist(col("a.sig"), col("b.sig")).as("dist"))
      .dropDuplicates("id_a", "id_b")
  }

  // ------------------------------------------------------------------
  // 128-bit SimHash — the >10⁶-doc scale path the 64-bit knob contract
  // names: doubling signature width lets the pigeonhole use 4 × 32-bit
  // chunks, cutting the uniform birthday floor from n²/2¹⁴ to n²/2³⁰
  // (negligible through ~10⁹ docs) while keeping the same exhaustive
  // dist<=3 guarantee and the same capped bucket join.
  // ------------------------------------------------------------------

  /** Tight-loop UDF 128-bit simhash: signature is array<bigint> [lo, hi].
    * `lo` votes on XXH64(token, seed 42) — BIT-IDENTICAL to the 64-bit
    * [[simhash]] (the 64-bit signature is literally the low half, spec'd
    * as such); `hi` votes on an independent XXH64(token, seed 1729).
    */
  private val simhash128FromTokensUdf = udf((toks: Seq[String]) => {
    if (toks == null) Array(0L, 0L)
    else {
      val votes = new Array[Int](128)
      val it = toks.iterator
      while (it.hasNext) {
        val tok = it.next()
        if (tok.nonEmpty) {
          val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              bytes.length, 42L)
          val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              bytes.length, 1729L)
          var b = 0
          while (b < 64) {
            if (((h1 >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
            if (((h2 >>> b) & 1L) != 0L) votes(64 + b) += 1 else votes(64 + b) -= 1
            b += 1
          }
        }
      }
      val sig = Array(0L, 0L)
      var b = 0
      while (b < 128) {
        if (votes(b) > 0) sig(b >>> 6) |= (1L << (b & 63))
        b += 1
      }
      sig
    }
  })

  /** Staged 128-bit simhash (see withMinhashSignature for why). */
  def withSimhash128(df: DataFrame, textCol: String, sigCol: String): DataFrame =
    df.withColumn("__sh_toks", split(lower(col(textCol)), "\\s+"))
      .withColumn(sigCol, simhash128FromTokensUdf(col("__sh_toks")))
      .drop("__sh_toks")

  def hammingDist128(a: Column, b: Column): Column =
    bit_count(element_at(a, 1).bitwiseXOR(element_at(b, 1))) +
      bit_count(element_at(a, 2).bitwiseXOR(element_at(b, 2)))

  /** SimHash near-dup pairs over 128-bit signatures — same semantics as
    * [[simhashDupPairs]] with the birthday floor pushed to n²/2³⁰.
    */
  def simhash128DupPairs(df: DataFrame, idCol: String, textCol: String,
                         maxDist: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    val sigs = graft.Caches.stage(withSimhash128(
      df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "__text", "sig").drop("__text"))
    hammingPairsFromSigs128(sigs, maxDist, maxBucketSize)
  }

  /** [[hammingPairsFromSigs]] for 128-bit array<bigint> [lo, hi]
    * signatures: pairs sharing at least one of the 4 × 32-bit chunks
    * (exhaustive for maxDist <= 3 by the same pigeonhole argument),
    * degenerate buckets capped identically. Returns (id_a, id_b, dist).
    */
  def hammingPairsFromSigs128(sigs: DataFrame, maxDist: Int = 3,
                              maxBucketSize: Int = 500): DataFrame =
    hammingCandidatePairs128(sigs, maxBucketSize).filter(col("dist") <= maxDist)

  /** 128-bit candidate pairs before the distance filter (the stress-
    * counted quantity, mirroring [[hammingCandidatePairs]]).
    */
  def hammingCandidatePairs128(sigs: DataFrame,
                               maxBucketSize: Int = 500): DataFrame = {
    val lo = element_at(col("sig"), 1)
    val hi = element_at(col("sig"), 2)
    def c32(x: Column, s: Int) =
      call_function("shiftrightunsigned", x, lit(s)).bitwiseAND(lit(0xFFFFFFFFL))
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(array(c32(lo, 0), c32(lo, 32), c32(hi, 0), c32(hi, 32))))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    chunkBucketPairs(chunks, maxBucketSize,
      (a, b) => hammingDist128(a, b))
  }

  // ------------------------------------------------------------------
  // Fuzzy (edit-distance) matching
  // ------------------------------------------------------------------

  /** Near-duplicate pairs by Levenshtein distance <= maxDist — the fuzzy
    * title/name matcher of the dedup family. Candidate generation blocks
    * on (first token, length band): true matches within maxDist can't
    * differ in length by more than maxDist, so banding by
    * floor(len / (maxDist+1)) plus the adjacent band bounds the self-join
    * while guaranteeing no loss when the first token agrees (the classic
    * blocking-key tradeoff, stated in the scaladoc rather than hidden).
    * Levenshtein itself is codegen'd (builtin) and engine-portable.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 maxDist: Int = 3, maxBlockSize: Int = 500): DataFrame =
    fuzzyCandidates(df, idCol, textCol, maxDist, maxBlockSize)
      .select(col("id_a"), col("id_b"),
        // thresholded levenshtein (Spark 3.5+): banded O(k·n) DP with
        // early exit instead of the full O(n²) table — returns -1 above
        // the bound, the exact distance inside it
        levenshtein(col("txt_a"), col("txt_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
      .dropDuplicates("id_a", "id_b")

  /** The blocked candidate join of [[fuzzyPairs]], pre-Levenshtein —
    * exposed so the scale-stress bench can count candidates directly.
    *
    * `maxBlockSize` caps degenerate blocking cells: on natural text a
    * stop-word first token ("The …") concentrates a constant fraction of
    * the corpus into one (token, band) cell, whose self-join is quadratic
    * in corpus size. Cells whose population exceeds the cap are dropped
    * from BOTH join sides via a broadcast anti-join on the (tiny)
    * over-cap cell list — the same shape as the minhash/simhash bucket
    * caps, with the same documented recall tradeoff: a true pair whose
    * only shared cell is degenerate is lost (pairs can still match
    * through an adjacent length band).
    */
  def fuzzyCandidates(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3, maxBlockSize: Int = 500): DataFrame = {
    val band = maxDist + 1
    // staged (r19): consumed by the degenerate scan, the home-cell side
    // AND the probe side below — three derivations otherwise
    val base = graft.Caches.stage(
      df.select(col(idCol).as("doc_id"), col(textCol).as("txt"),
        split(col(textCol), "\\s+").getItem(0).as("blk"),
        floor(length(col(textCol)) / band).as("lband")))
    val degenerate = base.groupBy("blk", "lband")
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBlockSize)
      .select("blk", "lband")
    // a-side rows join in their HOME cell; b-side probes into the three
    // adjacent cells — pruning the JOIN cell on both sides kills every
    // pair that would have matched inside a degenerate cell
    val prunedBase = base
      .join(broadcast(degenerate), Seq("blk", "lband"), "left_anti")
    val probes = base.select(col("doc_id"), col("txt"), col("blk"),
      explode(array(col("lband") - 1, col("lband"), col("lband") + 1)).as("lband"))
      .join(broadcast(degenerate), Seq("blk", "lband"), "left_anti")
    prunedBase.as("a")
      .join(probes.as("b"),
        col("a.blk") === col("b.blk") && col("a.lband") === col("b.lband")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.txt").as("txt_a"), col("b.txt").as("txt_b"))
  }

  // ------------------------------------------------------------------
  // Exact substring-span dedup (cut repeated spans, keep the canonical)
  // ------------------------------------------------------------------

  /** Exact SUBSTRING dedup at span granularity — the "deduplicating
    * training data" treatment (Lee et al. 2022) re-expressed relationally:
    * every w-token window that occurs more than once in the corpus keeps
    * exactly ONE canonical occurrence (global min (doc_id, pos)); every
    * other occurrence's token range is cut from its document, and the
    * surviving tokens are reassembled in order. Doc-level dedup misses
    * this entirely (boilerplate/licenses/quotes duplicated INSIDE
    * otherwise-distinct documents); the suffix-array machinery of the
    * paper is replaced by the window hash-agg a relational engine is good
    * at.
    *
    * Returns (doc_id, n_tokens, n_removed, clean_text) for EVERY input
    * doc (a fully-cut doc comes back with empty clean_text, so callers
    * can gate on n_removed/n_tokens).
    *
    * Scale shape: the window explode is one row per token (same order as
    * the FTS index build); duplicate detection is one hash-agg on the
    * window string; only windows with cnt ≥ 2 re-enter the join (the
    * unique tail — most of a healthy corpus — drops at the filter); the
    * range→position explode is bounded by w per removal; reassembly is
    * one per-doc agg of the surviving tokens. No pair joins anywhere.
    */
  /** The duplicate-window candidates of [[removeDuplicatedSpans]] — the
    * (window, cnt >= 2) rows that re-enter the removal join — exposed so
    * the scale-stress bench can count exactly the quantity whose growth
    * bounds the operator's cost (the unique-window tail drops at the
    * filter and never joins).
    */
  def duplicatedSpanWindows(df: DataFrame, idCol: String, textCol: String,
                            w: Int = 8): DataFrame = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    val toks = df.select(col(idCol).as("doc_id"),
      TextStats.wsTokens(col(textCol)).as("toks"))
    toks.select(col("doc_id"),
        posexplode(TextStats.ngramsWithDups(col("toks"), w)).as(Seq("pos", "g")))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
  }

  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            w: Int = 8): DataFrame = {
    require(w >= 2, s"window width must be >= 2 tokens, got $w")
    val toks = graft.Caches.stage(df.select(col(idCol).as("doc_id"),
      TextStats.wsTokens(col(textCol)).as("toks")))
    val wins = toks.select(col("doc_id"),
      posexplode(TextStats.ngramsWithDups(col("toks"), w)).as(Seq("pos", "g")))
    val dupWins = wins.groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("cnt") >= 2)
    val removedPos = wins.join(dupWins, Seq("g"))
      .filter(!(col("doc_id") === col("canon.doc_id") &&
        col("pos") === col("canon.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("tpos"))
      .distinct()
    val tokenRows = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("tpos", "tok")))
    val rebuilt = tokenRows
      .join(removedPos, Seq("doc_id", "tpos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("tpos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ------------------------------------------------------------------
  // Connected components (pairs -> canonical groups)
  // ------------------------------------------------------------------

  /** Connected components over a near-dup pair list: every doc labeled
    * with the smallest doc id reachable through dup edges — the
    * "pairs → canonical groups" end step of near-dup dedup (keep the rows
    * where `doc_id == component_id`, drop the rest).
    *
    * Iterative min-label propagation: each round, every node takes the
    * min of its own label and its neighbors' labels; converges in
    * O(component diameter) rounds. Each round is ONE shuffle join over
    * the edge list plus a node-sized join — the simple member of the
    * large-star/small-star CC family and the standard distributed shape
    * (a driver-side union-find would be the reference's dict pattern and
    * caps out at driver RAM). Per-round frames are persisted to cut
    * recomputation and unpersisted as soon as the next round lands; the
    * final labels are staged via [[graft.Caches]] for harness release.
    *
    * Two scale disciplines keep the iteration small:
    *  1. only EDGE-TOUCHED nodes iterate — an isolated node's label is
    *    itself forever, so the per-round frames are O(edge endpoints),
    *    not O(corpus) (in a near-dup graph, endpoints << corpus); the
    *    isolated remainder is unioned back, label = self, at the end;
    *  2. labels SEED at min(self, min neighbor) — one propagation step
    *    fused into initialization, so the dominant near-dup shapes
    *    (pairs, stars, triangles) start converged and pay exactly one
    *    verification round.
    *
    * Throws if `maxIters` rounds don't converge (a correctness gate must
    * not silently return half-propagated labels); near-dup graphs have
    * tiny diameters in practice, so the default is generous.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          idCol: String = "doc_id",
                          aCol: String = "id_a", bCol: String = "id_b",
                          maxIters: Int = 20): DataFrame = {
    val sc = nodes.sparkSession.sparkContext
    // truncate lineage each round with an EAGER localCheckpoint — persist
    // alone keeps the logical plan, which doubles in size per round of a
    // self-referential iteration (round 15's tree stringification alone
    // pegged a core for minutes before this). Blocks of superseded rounds
    // are dropped immediately; the final round's blocks back the returned
    // frame (non-recomputable) and are swept by the harness between
    // queries like every staged cache.
    def truncate(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val d = df.localCheckpoint(eager = true)
      (d, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def drop(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    val ids = nodes.select(col(idCol).as("doc_id"))
    // edges gated to known nodes once (edge-sized, outside the loop), so
    // the seed's min-neighbor matches what propagation from labeled
    // nodes would produce — an endpoint without a label contributes
    // nothing in either formulation
    val undRaw = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    // staged (r19): the loop joins `und` every round, and without the
    // cache each round re-derived the whole edge plan — for the LSH /
    // pHash group queries that plan is the banded candidate-pair
    // generation itself (explode + self-join), re-run per iteration.
    // Same discipline as pageRank's staged edge+outdegree relation;
    // harness sweeps release it.
    val und = graft.Caches.stage(undRaw
      .join(ids.select(col("doc_id").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi"))
    // discipline 1+2: iterate only edge-touched nodes, seeded one step in
    var (labels, labelBlocks) = truncate(
      und.groupBy(col("src").as("doc_id")).agg(min("dst").as("nmin0"))
        .select(col("doc_id"), least(col("doc_id"), col("nmin0")).as("label")))
    // convergence detection is folded INTO the propagation round: a
    // side-effecting row filter bumps this accumulator whenever a label
    // shrinks, and the eager localCheckpoint materialization is the one
    // pass that runs it — no extra per-round comparison job. Retried
    // tasks can only over-count, never turn a changed round into zero,
    // and zero-vs-nonzero is all convergence needs.
    val changedAcc = sc.longAccumulator("graft.cc.changed")
    val bump = udf { (chg: Boolean) =>
      if (chg) changedAcc.add(1L); true
    }.asNondeterministic()
    var converged = false
    var i = 0
    try {
      while (!converged && i < maxIters) {
        val nbrMin = und
          .join(labels.select(col("doc_id").as("src"), col("label")), Seq("src"))
          .groupBy(col("dst").as("doc_id"))
          .agg(min("label").as("nmin"))
        val prop = labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"), col("label").as("prev"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        // path halving (pointer jumping): follow each node's label to
        // ITS label — collapses chains in O(log diameter) rounds instead
        // of O(diameter) one-hop propagation (the same trick
        // large-star/small-star uses). One extra self-join on the
        // node-sized label table per round, repaid exponentially in
        // round count.
        val halved = prop
          .join(prop.select(col("doc_id").as("label"), col("label").as("label2")),
            Seq("label"), "left")
          .select(col("doc_id"), col("prev"),
            least(col("label"), coalesce(col("label2"), col("label"))).as("label"))
        val flagged = halved
          .filter(bump(col("label") < col("prev")))
          .select("doc_id", "label")
        changedAcc.reset()
        val (next, nextBlocks) = truncate(flagged)
        converged = changedAcc.value == 0
        drop(labelBlocks)
        labels = next; labelBlocks = nextBlocks
        i += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIters rounds")
      // isolated nodes re-enter label = self (cheap anti join, no
      // iteration cost paid for them)
      labels.select(col("doc_id"), col("label").as("component_id"))
        .unionByName(ids
          .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("component_id")))
    } catch {
      case e: Throwable => drop(labelBlocks); throw e
    }
  }

  // ------------------------------------------------------------------
  // Embedding cosine near-dup
  // ------------------------------------------------------------------

  /** SemDeDup-style SEMANTIC dedup: k-means-cluster the embeddings with
    * the IVF coarse quantizer (deterministic seed = smallest `nClusters`
    * ids, `kmeansIters` Lloyd rounds), then verify exact cosine >=
    * `threshold` only WITHIN a cluster — near-semantic-duplicates land in
    * the same cluster, so the candidate join is bucketed by construction
    * (the published SemDeDup recipe, expressed as the same
    * bucket-then-verify shape as every other member of this family).
    *
    * Scale discipline: `nClusters` must grow with the corpus (K ≈ N/10⁴
    * keeps expected cluster size constant; the quantizer stays driver-
    * sized — nClusters × dims doubles); `maxClusterSize` drops degenerate
    * clusters (a near-constant embedding region) from the self-join via
    * the family's broadcast-anti cap, with the usual documented recall
    * tradeoff. Norms are staged per row so the quadratic verify never
    * recomputes them.
    */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
                       nClusters: Int = 16, kmeansIters: Int = 1,
                       threshold: Double = 0.95,
                       maxClusterSize: Int = 10000): DataFrame =
    semanticCandidatePairs(df, idCol, vecCol, nClusters, kmeansIters,
      maxClusterSize)
      .filter(col("cosine") >= threshold)

  /** The cluster-bucketed candidate join of [[semanticDupPairs]] with
    * exact cosines but BEFORE thresholding — exposed so the scale-stress
    * bench can count candidates directly (the quantity the "nClusters
    * scales with the corpus" discipline must keep near-linear).
    */
  def semanticCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                             nClusters: Int, kmeansIters: Int = 1,
                             maxClusterSize: Int = 10000): DataFrame = {
    val c = df.select(col(idCol).cast("long").as("doc_id"),
      col(vecCol).cast("array<double>").as("vec"))
    // null vectors can't seed a centroid (they never cluster or pair
    // downstream either — null sims drop out of every verify filter)
    val seed: Array[(Long, Array[Double])] = c.filter(col("vec").isNotNull)
      .orderBy("doc_id").limit(nClusters)
      .collect()  // quantizer seed rows, not data
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = Similarity.refineCentroids(c, seed, kmeansIters, "vec")
    val assigned = graft.Caches.stage(c.select(col("doc_id"), col("vec"),
      Similarity.l2Norm(col("vec")).as("nrm"),
      Similarity.nearestCentroid(col("vec"), cents).as("cluster")))
    val degenerate = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxClusterSize).select("cluster")
    val pruned = assigned.join(broadcast(degenerate), Seq("cluster"), "left_anti")
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Similarity.cosineStaged(col("a.vec"), col("b.vec"),
          col("a.nrm"), col("b.nrm")).as("cosine"))
  }

  /** Near-duplicate pairs by embedding cosine >= threshold. Candidates are
    * generated by random-hyperplane sign buckets (`planes` deterministic
    * hyperplanes via per-dimension hash weights); exact cosine verifies.
    * planes=0 falls back to all-pairs (test scale only).
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 8,
                        maxBucketSize: Int = 2000): DataFrame = {
    val pruned = embeddingBuckets(df, idCol, vecCol, planes, maxBucketSize)
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The sign-bucket candidate id-pairs BEFORE the cosine filter —
    * counted by the scale-stress bench. Like every generator here, the
    * knob contract is stated: `planes` must GROW with the corpus
    * (buckets ∝ corpus keeps expected bucket size constant, the
    * nClusters-∝-corpus discipline), and `maxBucketSize` caps the
    * degenerate orthants real (correlated-dimension) embeddings pile
    * into — without the cap one crowded orthant is a quadratic self-join
    * no plane count fixes. Recall tradeoff as with every cap: a true
    * pair whose only shared bucket is degenerate is lost.
    */
  def embeddingCandidates(df: DataFrame, idCol: String, vecCol: String,
                          planes: Int = 8,
                          maxBucketSize: Int = 2000): DataFrame = {
    val pruned = embeddingBuckets(df, idCol, vecCol, planes, maxBucketSize)
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
  }

  private def embeddingBuckets(df: DataFrame, idCol: String, vecCol: String,
                               planes: Int, maxBucketSize: Int): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(vecCol).as("vec"))
    val withBucket =
      if (planes <= 0) base.withColumn("bucket", lit(0L))
      else base.withColumn("bucket", Similarity.hyperplaneBucket(col("vec"), planes))
    val degenerate = withBucket.groupBy("bucket")
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
      .select("bucket")
    // staged (r19): the callers self-join this frame on both sides —
    // un-cached, each side re-hashed every vector through the
    // hyperplane buckets
    graft.Caches.stage(
      withBucket.join(broadcast(degenerate), Seq("bucket"), "left_anti"))
  }
}
