package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4.2: alias counts are Zipf-skewed;
  * AQE's skew-join handles sort-merge skew at runtime, salting handles
  * aggregation skew and broadcast-averse joins deterministically).
  */
object Skew {

  /** Two-phase salted aggregation: count per (key, salt) first — spreading
    * one hot key over `salts` reducers — then combine the partials. The
    * classic fix when one alias/key holds a large share of all rows.
    */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("count"))

  /** Salted sum — same two-phase shape for an arbitrary value column. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as(s"sum_$valueCol"))

  /** Salted large-large equi-join for a skewed left side: left rows get a
    * random-ish deterministic salt in [0, salts); right rows are exploded
    * `salts` times so every (key, salt) matches. Right-side row count
    * multiplies by `salts` — use only when the right side is too big to
    * broadcast and the left key distribution is heavy-tailed.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
