package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Battery integrity: no silent key collisions when the component maps
  * merge, names stay driver-friendly, and every oracle belongs to a query.
  */
class BatterySpec extends AnyFunSuite {

  test("no query-name collisions across battery modules") {
    val componentSizes = Seq(
      RelationalQueries.all.size, TextQueries.all.size, EventQueries.all.size,
      VectorQueries.all.size, PipelineQueries.all.size, SnapshotQueries.all.size,
      PretrainQueries.all.size
    )
    assert(SparkEntry.battery.size == componentSizes.sum,
      s"map merge lost ${componentSizes.sum - SparkEntry.battery.size} colliding keys")
  }

  test("names are lowercase identifiers; oracles map onto queries") {
    SparkEntry.battery.keys.foreach(k => assert(k.matches("[a-z0-9_]+"), k))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.size >= 50, "oracled coverage must not regress")
  }

  test("every battery entry declares the SURVEY operators it exercises") {
    val missing = SparkEntry.battery.collect { case (k, q) if q.surveyIds.isEmpty => k }
    assert(missing.isEmpty, s"entries without survey mapping: $missing")
  }
}
