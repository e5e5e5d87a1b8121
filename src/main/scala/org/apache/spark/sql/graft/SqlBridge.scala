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

  // ── seams for the SQL verb surface (graft.sql.GraftSqlParser) ──────
  // A SQL parser extension needs three more session internals every
  // published connector's parser touches (Delta's DeltaSqlParser +
  // DeltaCatalog shape): the delegate parser for non-verb statements,
  // Dataset.ofRows to execute a parsed command plan, and the session
  // catalog to resolve a TABLE NAME to its `USING graft` path.

  /** The session's own SQL parser — the delegate for every statement
    * the verb grammar does not claim.
    */
  def sessionParser(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.parser.ParserInterface =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser

  /** Execute a logical plan (a parsed verb command) as a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Resolve a catalog table NAME to its versioned-table path — Some
    * only when the table exists AND its provider is `graft`; any lookup
    * failure is None (the statement then belongs to the delegate).
    */
  def graftTablePath(spark: org.apache.spark.sql.SparkSession,
                     nameParts: Seq[String]): Option[String] =
    try {
      val ss = spark.asInstanceOf[classic.SparkSession]
      val id = nameParts match {
        case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
        case Seq(db, t) =>
          org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
        // fully-qualified session-catalog refs (spark_catalog.db.t)
        // resolve like db.t; refs into OTHER catalogs are not ours
        case Seq(cat, db, t)
            if cat.equalsIgnoreCase(
              org.apache.spark.sql.connector.catalog.CatalogManager
                .SESSION_CATALOG_NAME) =>
          org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
        case _ => return None
      }
      val meta = ss.sessionState.catalog.getTableMetadata(id)
      if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) None
      else meta.storage.properties.get("path")
        .orElse(meta.storage.locationUri.map(u =>
          new org.apache.hadoop.fs.Path(u).toString))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sync a catalog table's stored schema after a metadata-only
    * rename/drop: DSv1 resolution replays the CATALOG schema against
    * the relation and fails loud on mismatch, so a schema-changing verb
    * on a named table must update the catalog in the same stroke.
    */
  def syncCatalogSchema(spark: org.apache.spark.sql.SparkSession,
                        nameParts: Seq[String],
                        schema: org.apache.spark.sql.types.StructType)
      : Unit = {
    val ss = spark.asInstanceOf[classic.SparkSession]
    val id = nameParts match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) =>
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case Seq(cat, db, t)
          if cat.equalsIgnoreCase(
            org.apache.spark.sql.connector.catalog.CatalogManager
              .SESSION_CATALOG_NAME) =>
        org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case _ => return
    }
    // alterTable (full metadata replace), NOT alterTableDataSchema —
    // the latter refuses column drops/renames by design, but here the
    // TABLE's own manifest is the source of truth and already moved
    val meta = ss.sessionState.catalog.getTableMetadata(id)
    ss.sessionState.catalog.alterTable(meta.copy(schema = schema))
    ss.sessionState.catalog.refreshTable(id)
  }

  /** Spark's own bucket-file naming contract (`..._NNNNN.ext`), bridged
    * for the versioned-table bucketing layout: the writer must suffix
    * files with EXACTLY the id string the scan-side parser recovers, or
    * bucketed execution silently degrades.
    */
  def bucketIdOf(fileName: String): Option[Int] =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .getBucketId(fileName)

  def bucketIdSuffix(id: Int): String =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .bucketIdToString(id)

  /** The bucket id Spark's `HashPartitioning(cols, n)` assigns to a
    * literal tuple — evaluated through the SAME `partitionIdExpression`
    * shape (`pmod(murmur3(exprs), n)`) the arranged write shuffled by,
    * so the scan-side composite point-lookup prune can never disagree
    * with the writer's hash.
    */
  def bucketIdOfLiterals(
      lits: Seq[org.apache.spark.sql.catalyst.expressions.Literal],
      numBuckets: Int): Int =
    org.apache.spark.sql.catalyst.plans.physical
      .HashPartitioning(lits, numBuckets).partitionIdExpression
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Int]

  /** Destructure a DSv2 CLUSTERED BY transform — plain or `SORTED BY`
    * — into (numBuckets, bucketCols, sortCols); None for any other
    * transform shape (multi-part references fail the caller's own
    * checks). Both transform case classes are `private[sql]`, hence
    * bridged here.
    */
  def bucketTransformOf(
      t: org.apache.spark.sql.connector.expressions.Transform)
      : Option[(Int, Seq[String], Seq[String])] = {
    import org.apache.spark.sql.connector.expressions.BucketTransform
    def names(
        rs: Seq[org.apache.spark.sql.connector.expressions.NamedReference])
        : Option[Seq[String]] =
      if (rs.forall(_.fieldNames.length == 1))
        Some(rs.map(_.fieldNames.head))
      else None
    t match {
      // the companion's Transform extractor matches BOTH `bucket` and
      // `sorted_bucket` (sortCols empty for the former)
      case BucketTransform(n, cols, sorted) =>
        for (c <- names(cols); s <- names(sorted)) yield (n, c, s)
      case _ => None
    }
  }
}
