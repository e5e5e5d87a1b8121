package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered exact anti/semi joins — the 100 TB shape of the
  * F6/F7 resume joins (ref wikidata.py:90-92,112-114: skip records whose
  * id is already ingested). At scale the already-ingested id set is
  * large (too big to broadcast as a hash set would be reckless — but a
  * Bloom filter over a billion ids at 1% fpp is ~1.2 GB of bits, still
  * broadcast material), while the overwhelming majority of NEW dump rows
  * are absent from it. A broadcast Bloom filter splits the dump BEFORE
  * the join shuffle:
  *
  *  - mightContain == false ⇒ the id is DEFINITELY not ingested (Bloom
  *    has no false negatives) — the row goes straight into the anti
  *    result (or straight out of the semi result) with no shuffle;
  *  - mightContain == true ⇒ true match or false positive — only this
  *    thin slice (|matches| + fpp·|rest|) flows through the exact join.
  *
  * Semantics are exactly those of the plain join; the filter only
  * reroutes traffic. Spark's own runtime bloom-filter rewrite targets
  * selective shuffle joins adaptively; this operator makes the choice
  * explicit and deterministic for the ingest-resume pattern where the
  * planner cannot know the dump-vs-ingested asymmetry in advance.
  */
object BloomJoin {

  private def mightContain(df: DataFrame, ids: DataFrame, key: String,
                           expectedIds: Long, fpp: Double) = {
    // keys are compared through an injective string cast so one filter
    // implementation serves long/int/string keys alike
    val bf = ids.select(col(key).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .stat.bloomFilter("k", expectedIds, fpp)
    val bfb = df.sparkSession.sparkContext.broadcast(bf)
    udf((k: String) => k != null && bfb.value.mightContainString(k))
      .apply(col(key).cast("string"))
  }

  /** Exact `left_anti` of `df` against `ids` on `key`, Bloom-prefiltered.
    * `expectedIds`/`fpp` size the filter (see object scaladoc). Null keys
    * never equal anything in an equi-anti-join, so they are kept — the
    * bloom-false branch preserves that.
    */
  def bloomAntiJoin(df: DataFrame, ids: DataFrame, key: String,
                    expectedIds: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    val might = mightContain(df, ids, key, expectedIds, fpp)
    val definitelyNew = df.filter(!might)
    val candidates = df.filter(might)
      .join(ids.select(col(key)).distinct(), Seq(key), "left_anti")
    definitelyNew.unionByName(candidates)
  }

  /** Exact `left_semi` dual: bloom-false rows are definitely absent and
    * drop out before the shuffle; only possible members join.
    */
  def bloomSemiJoin(df: DataFrame, ids: DataFrame, key: String,
                    expectedIds: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame =
    df.filter(mightContain(df, ids, key, expectedIds, fpp))
      .join(ids.select(col(key)).distinct(), Seq(key), "left_semi")
}
