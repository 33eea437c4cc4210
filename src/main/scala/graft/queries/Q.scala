package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One battery entry: a Spark query over the sf-dir tables plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle. Column names
  * and types are aligned on both sides — the driver sorts columns by name and
  * hashes values, so every computed column is aliased identically, integer
  * aggregates are cast to BIGINT in the oracle (DuckDB sums to HUGEINT), and
  * float aggregates are rounded to a decimal place where both engines'
  * results are exact-equal.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** surveyIds: which SURVEY.md §2 operators this query exercises. */
    surveyIds: Seq[String] = Seq.empty
)
