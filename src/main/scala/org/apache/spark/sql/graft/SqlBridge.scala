package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, classic}

/** Bridge into two `private[sql]` Spark constructors the DSv1 streaming
  * provider contract forces on every connector (Delta's DeltaSource /
  * DeltaSink ship the identical bridge, in-package like this one):
  *
  *  - a DSv1 `Source.getBatch` MUST return a DataFrame whose logical
  *    plan carries `isStreaming = true` — `MicroBatchExecution` asserts
  *    it — and the only constructor that plants the flag is
  *    `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`;
  *  - a DSv1 `Sink.addBatch` receives a DataFrame bound to the running
  *    incremental execution — re-planning it through a fresh batch
  *    write (our commit verbs build new jobs over it) requires
  *    re-rooting the rows as a plain batch plan first.
  *
  * This file is the ONLY source outside the `graft` namespace; it holds
  * no logic beyond the two delegations, so the engine's code stays
  * honest about exactly which private seams it touches.
  */
object SqlBridge {

  /** Re-root `df`'s physical rows as a STREAMING-flagged DataFrame —
    * the shape `Source.getBatch` must return. Lazy end to end: `toRdd`
    * plans but does not run; execution happens when the micro-batch
    * does.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val ss = df.sparkSession.asInstanceOf[classic.SparkSession]
    ss.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** Re-root a sink-delivered micro-batch as a plain BATCH DataFrame
    * the commit verbs can plan fresh jobs over.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val ss = df.sparkSession.asInstanceOf[classic.SparkSession]
    ss.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }
}
