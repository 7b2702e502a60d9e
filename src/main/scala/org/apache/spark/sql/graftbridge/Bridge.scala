package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and LogicalPlan → DataFrame bridges. Spark 4
  * hides the classic converters behind `private[sql]`; custom-operator
  * libraries conventionally expose them from a package under
  * `org.apache.spark.sql`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The persisted RDDs behind a `localCheckpoint`ed DataFrame (the
    * `LogicalRDD` leaves of its plan) — `Dataset.unpersist` only talks
    * to the CacheManager, so explicitly releasing checkpoint blocks
    * needs the underlying RDD handles.
    */
  def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  /** A DataFrame whose logical plan is a single `LogicalRDD` leaf over
    * an existing `InternalRow` RDD — the lineage-flattening half of
    * `localCheckpoint` WITHOUT the truncation: actions recompute
    * through the RDD DAG (the compiled physical plan) if the RDD's
    * storage is evicted, instead of failing, and the Catalyst plan
    * stays leaf-sized for every downstream reference.
    */
  def fromInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** A DataFrame's physical output as a FRESH `InternalRow` RDD safe to
    * persist (rows copied out of the operators' reused buffers) —
    * pairs with [[fromInternalRows]].
    */
  def toInternalRows(df: DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd.map(_.copy())

  /** Every "t<version>/<name>"-suffixed file a FileStreamSource
    * checkpoint's source ledger attributes to a batch ≤ `maxBatchId` —
    * read through Spark's OWN `FileStreamSourceLog` (the class that
    * WRITES the ledger also parses its version header, compaction
    * layout, and any future format evolution). This is the one
    * streaming-internals touch in the library
    * ([[graft.etl.ChangeFeed.CheckpointFrontier]]); constructing the
    * `private[sql]`-package class lives here with the other
    * private-API converters so a Spark upgrade breaks ONE auditable
    * file, loudly, at compile time.
    */
  def committedSourceFiles(spark: SparkSession, sourceLogDir: String,
                           maxBatchId: Long): Seq[String] = {
    import org.apache.spark.sql.execution.streaming.runtime.FileStreamSourceLog
    val log = new FileStreamSourceLog(FileStreamSourceLog.VERSION, spark,
      sourceLogDir)
    log.allFiles().iterator
      .filter(_.batchId <= maxBatchId)
      .map(_.sparkPath.toUri.getPath.split('/'))
      .collect { case parts if parts.length >= 2 =>
        parts.takeRight(2).mkString("/") }
      .toSeq
  }
}
