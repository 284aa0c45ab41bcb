package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between the public Column API and Catalyst
  * expressions. Spark 4 made the converters `private[sql]`; exposing them
  * from a child package of org.apache.spark.sql is the standard extension-
  * library pattern for classic (non-connect) deployments.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DSv2 Predicate → V1 Filter translation (PredicateUtils is
    * `private[sql]` in Spark 4) — used by SupportsDeleteV2.
    */
  def predicatesToV1(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** DataFrame over an already-analyzed logical plan (Dataset.ofRows is
    * `private[sql]` in Spark 4) — used to execute the source side of a
    * rewritten MERGE command.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Connector literal from a Catalyst-internal value (`LiteralValue`
    * is `private[sql]` in Spark 4) — used to report column defaults
    * through the v2 Column API.
    */
  def literalValue(v: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[Any] =
    org.apache.spark.sql.connector.expressions.LiteralValue(v, dt)

  /** Hadoop Configuration prepared for task-level parquet writing of
    * InternalRows with Spark's own ParquetWriteSupport (`private[sql]`
    * machinery): carries the session's SQL confs, the row schema, and
    * the write settings the engine's batch path pins (MICROS
    * timestamps, no legacy format, CORRECTED rebase). Used by the DSv2
    * streaming sink's executor-side writers.
    */
  def preparedParquetConf(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.hadoop.conf.Configuration = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    import org.apache.spark.sql.internal.SQLConf
    val c = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, c)
    c.set(org.apache.parquet.hadoop.ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    c.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    c.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    // SparkToParquetSchemaConverter reads these with conf.get(key) — no
    // default — when constructed from a bare Configuration
    c.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      spark.conf.get(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true"))
    c.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      spark.conf.get(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
        "false"))
    c.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    c.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    if (c.get(org.apache.parquet.hadoop.ParquetOutputFormat.COMPRESSION)
        == null)
      c.set(org.apache.parquet.hadoop.ParquetOutputFormat.COMPRESSION,
        spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
          .toUpperCase(java.util.Locale.ROOT))
    c
  }

  /** One parquet file writer over a `preparedParquetConf` — returns
    * (write, close). Runs on executors; the ParquetOutputWriter type
    * itself is `private[sql]`, hence the lambda surface.
    */
  def parquetRowWriter(path: String,
      conf: org.apache.hadoop.conf.Configuration, partitionId: Int,
      attempt: Int): (org.apache.spark.sql.catalyst.InternalRow => Unit,
        () => Unit) = {
    val tac = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID("graft-stream",
        0, org.apache.hadoop.mapreduce.TaskType.MAP, partitionId, attempt))
    val w = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetOutputWriter(path, tac)
    (w.write _, () => w.close())
  }

  /** Hadoop Configuration prepared for task-level ORC writing of
    * InternalRows — the ORC twin of [[preparedParquetConf]] for the
    * DSv2 streaming sink's format parity (`write.format.default=orc`
    * tables stage orc epochs, not silent parquet). Carries the
    * session's compression choice (what `df.write.orc` would use) and
    * the vectorized writer batch size; the schema itself is passed to
    * [[orcRowWriter]] directly (OrcOutputWriter sets it on the writer
    * options, not from the conf).
    */
  def preparedOrcConf(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.hadoop.conf.Configuration = {
    import org.apache.spark.sql.execution.datasources.orc.OrcOptions
    import org.apache.spark.sql.internal.SQLConf
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val c = classic.sessionState.newHadoopConf()
    c.set(org.apache.orc.OrcConf.COMPRESS.getAttribute,
      new OrcOptions(Map.empty[String, String],
        classic.sessionState.conf).compressionCodec)
    c.setInt(SQLConf.ORC_VECTORIZED_WRITER_BATCH_SIZE.key,
      classic.sessionState.conf.orcVectorizedWriterBatchSize)
    c
  }

  /** One ORC file writer over a `preparedOrcConf` — returns
    * (write, close). Runs on executors; OrcOutputWriter is
    * `private[sql]`, hence the lambda surface.
    */
  def orcRowWriter(path: String, schema: org.apache.spark.sql.types.StructType,
      conf: org.apache.hadoop.conf.Configuration, partitionId: Int,
      attempt: Int): (org.apache.spark.sql.catalyst.InternalRow => Unit,
        () => Unit) = {
    val tac = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID("graft-stream",
        0, org.apache.hadoop.mapreduce.TaskType.MAP, partitionId, attempt))
    val batch = conf.getInt(org.apache.spark.sql.internal.SQLConf
      .ORC_VECTORIZED_WRITER_BATCH_SIZE.key, 1024)
    val w = new org.apache.spark.sql.execution.datasources.orc
      .OrcOutputWriter(path, schema, tac, batch)
    (w.write _, () => w.close())
  }

  /** Hive-style partition path segment (`ExternalCatalogUtils` is
    * catalyst-internal): escaping + __HIVE_DEFAULT_PARTITION__ for
    * null/empty, exactly as Spark's own partitioned writes render.
    */
  def partitionPathSegment(name: String, value: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .getPartitionPathString(name, Option(value).getOrElse(""))

  /** Register a SQL function on a LIVE session (extensions normally apply
    * only at session build time; this installs into the session's
    * function registry directly).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
