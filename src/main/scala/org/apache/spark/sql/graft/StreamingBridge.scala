package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` call a DSv1 streaming `Source` needs: the
  * DataFrame a `getBatch` returns must carry `isStreaming = true`
  * (`MicroBatchExecution` asserts it), and the only constructor for that is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true)`.
  * The computed batch plan (here: the snapshot changelog's join/exceptAll
  * pipeline) is captured as its executed RDD lineage — the same move
  * Delta's `DeltaSource` makes for its file-index batches. Lives under
  * `org.apache.spark.sql` only for package-private access; nothing else is
  * touched.
  */
object StreamingBridge {

  /** Rewrap a computed batch DataFrame as a streaming-tagged frame with
    * exactly `schema`'s columns (caller aligns columns beforehand).
    */
  def asStreamingBatch(df: DataFrame, schema: StructType): DataFrame = {
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, schema, isStreaming = true)
  }
}
