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

  /** Write `df` as a bucketed parquet table: rows are hash-clustered into
    * `numBuckets` files per partition by `bucketCol` and sorted inside each
    * bucket. Two tables bucketed the same way on their join key co-locate:
    * a join between them needs NO shuffle (and with the sort, no re-sort) —
    * at 100 TB this turns every fact×fact join on the bucket key from a
    * full-network exchange into a local merge. The bucket metadata lives in
    * the session catalog, so readers must come through [[readTable]].
    *
    * The table is external (data at `path`), `Overwrite` replaces both data
    * and catalog entry.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a catalog table (bucketed writes must be read this way — a plain
    * `read.parquet` on the files would discard the bucket spec and
    * reintroduce the shuffle).
    */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
