package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the DESCRIBE/data-quality surface (null rates,
  * cardinalities, ranges) a replication pipeline runs against source and
  * target to validate a sync, and a training-data pipeline runs to catch
  * drift.
  *
  * One pass over the table: every per-column statistic is an aggregate in a
  * single `agg(...)`, so the scan happens once and all stats combine
  * map-side; the per-column rows are then unpivoted from the single result
  * row (driver-side width, not data volume).
  */
object Profiler {

  /** Profile `cols` of `df`: one output row per column with
    * (column, n_rows, n_null, n_distinct, min_str, max_str). Min/max are
    * stringified so mixed column types fit one frame.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__null"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"${c}__null").as("n_null"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
