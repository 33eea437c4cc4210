package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental identify step — the reference's central operator (J1).
  *
  * A file is processed unless it appears in OUR state with an identical hash
  * (reference `state.py:77-81`, design note `state.py:6-14`, applied at
  * `pipeline_orchestrator.py:214-278`). Failures never land on the processed
  * side, so previously-failed docs re-enter automatically (J4,
  * `state.py:91-97`).
  *
  * Scale: the ledger is small relative to the corpus (one row per document,
  * no content) but not bounded — at ~10⁸ documents it is multi-GB, past any
  * broadcast ceiling. The anti-join is therefore size-adaptive: no broadcast
  * hint, so AQE broadcasts the processed side while its runtime size fits
  * `spark.sql.autoBroadcastJoinThreshold` and switches to a shuffle join
  * beyond that. The status=processed filter prunes the ledger's partition
  * directory before the join (see [[graft.state.PipelineState]]).
  */
object Identify {

  /** @param changed CDC rows: (docId, hash, ...) with status ∈ added/modified
    * @param state   ledger rows: (docId, hash, status) with status=processed
    * @param force   reprocess everything (reference `pipeline_orchestrator.py:249-256`)
    * @param limit   optional head-n after a stable sort (L1)
    */
  def identifyFiles(
      changed: DataFrame,
      state: DataFrame,
      force: Boolean = false,
      limit: Option[Int] = None
  ): DataFrame = {
    val processed = state
      .filter(col("status") === "processed")
      .select(col("docId"), col("hash"))
    val toProcess =
      if (force) changed
      else changed.join(processed, Seq("docId", "hash"), "left_anti")
    limit match {
      case Some(n) => toProcess.orderBy(col("docId")).limit(n)
      case None    => toProcess
    }
  }

  /** J2/SO1: state ⟷ store doc-id set comparison
    * (reference `validation_service.py:43-65`). Returns rows tagged with the
    * side that is missing the id.
    */
  def validate(stateIds: DataFrame, storeIds: DataFrame): DataFrame = {
    val a = stateIds.select(col("docId")).distinct()
    val b = storeIds.select(col("docId")).distinct()
    val missingInStore = a.join(b, Seq("docId"), "left_anti")
      .withColumn("side", lit("state_only"))
    val missingInState = b.join(a, Seq("docId"), "left_anti")
      .withColumn("side", lit("store_only"))
    missingInStore.unionByName(missingInState)
  }
}
