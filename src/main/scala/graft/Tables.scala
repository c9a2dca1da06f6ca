package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loader for the graft engine.
  *
  * Mirrors the reference's notion of "peer" tables (the PostgreSQL source
  * tables created in `quickstart_prepare_peers.sh:24-78` and their ClickHouse
  * replicas): here every table is a columnar parquet dataset addressed by a
  * directory, which is also the natural layout for a 100 TB lake — one
  * directory per table, partition-pruned and column-pruned at scan time.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. Scans stay declarative so Catalyst pushes filters and
    * prunes columns down to the parquet reader.
    *
    * `events.ts` has shipped in two physical flavors across testdata
    * generations, so the loader dispatches on the type it actually sees:
    *   - parquet TIMESTAMP(NANOS), which Spark only reads via
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set in our session
    *     builders) — the long nanos are converted back to a microsecond
    *     timestamp with exact integral division;
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads
    *     as TIMESTAMP_NTZ — cast to the session-local TIMESTAMP. All graft
    *     sessions pin `spark.sql.session.timeZone=UTC`, so the cast is
    *     wall-clock-identical to a naive (DuckDB-style) reading.
    * Downstream operators therefore always see a plain TimestampType `ts`.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    } else df
  }
}
