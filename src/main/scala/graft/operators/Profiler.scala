package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality sweep a training-data pipeline runs
  * before ingesting a new source: per-column row/null/distinct counts and
  * min/max, computed in ONE pass over the data (a single aggregate producing
  * a struct per column, unpivoted driver-side), not one scan per column.
  */
object Profiler {

  /** @return one row per profiled column:
    *         (column, n, n_null, n_distinct, min_val, max_val) — min/max as
    *         strings so heterogeneous column types stack into one result.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")
      )
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    columns.map { c =>
      (
        c,
        row.getAs[Long](s"${c}__n"),
        row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"),
        row.getAs[String](s"${c}__min"),
        row.getAs[String](s"${c}__max")
      )
    }.toDF("column", "n", "n_null", "n_distinct", "min_val", "max_val")
  }
}
