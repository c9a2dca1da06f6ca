package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake layout management: time-partitioned fact tables so date filters
  * become partition pruning (directories skipped at planning time, before a
  * single byte is read). At 100 TB this is the difference between scanning
  * one month and scanning the lake — the declarative counterpart to
  * ClickHouse's PARTITION BY toYYYYMM(date) on the replicated target.
  */
object Layout {

  /** Write `df` partitioned by month of `tsCol` (adds `part_month` =
    * 'yyyy-MM' directory key).
    */
  def writeMonthly(df: DataFrame, tsCol: String, targetDir: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode(SaveMode.Overwrite).partitionBy("part_month").parquet(targetDir)

  /** Read the monthly layout; month-range predicates on `part_month` prune
    * at the directory level.
    */
  def readMonthly(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir)
}
