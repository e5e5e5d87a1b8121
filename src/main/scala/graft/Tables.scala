package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  * Every SparkEntry query receives an `sfDir` and reads through here so the
  * scan options (vectorized parquet, pushdown) are uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` physical layout has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (pre-r9), which Spark's
    * parquet reader rejects without `legacy.parquet.nanosAsLong`, and
    * native micros (r9+), which Spark reads as TIMESTAMP_NTZ. Set the
    * nanos fallback and let [[normalizeTs]] map whatever arrives onto
    * one TimestampType column.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Normalize an events frame's `ts` onto TimestampType (session UTC)
    * across the driver's testdata layouts: LongType is nanos-since-epoch
    * (the nanosAsLong read of the pre-r9 layout), TIMESTAMP_NTZ is the
    * r9 native-micros layout (cast preserves the wall-clock instant
    * under the pinned UTC session), TimestampType passes through. DuckDB
    * reads both layouts as plain timestamps, so the oracle SQL never
    * changes — only Spark's reader sees the physical difference.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(eventsRaw(s, d))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
