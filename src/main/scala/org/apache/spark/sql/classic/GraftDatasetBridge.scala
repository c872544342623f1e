package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for graft's V1 streaming source (graft/stream/AcidStream.scala).
  *
  * A V1 `Source.getBatch` must return a PLAN-level DataFrame flagged
  * `isStreaming=true` — the engine swaps it into the micro-batch plan
  * (FileStreamSource builds its batches the same way). The only
  * constructor for that is `Dataset.ofRows`, which is `private[sql]`, so
  * this one-line forwarder lives in the `sql.classic` package — the
  * standard shim every out-of-tree V1 connector ships. No behavior, no
  * state; everything else in the source stays in graft's own namespace.
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark, plan)

  /** Streaming-flagged DataFrame over an already-planned RDD — the V1
    * Kafka source's own getBatch pattern. Needed when the batch plan
    * contains JOINS (the CDF delete-preimage semi/anti joins): re-flagging
    * its LEAVES as streaming would turn them into (unsupported)
    * stream-stream joins, whereas one streaming LogicalRDD leaf keeps the
    * computation a plain batch plan underneath. */
  def ofInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)
}
