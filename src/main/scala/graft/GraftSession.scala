package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session bootstrap for the engine: AQE with skew-join
  * handling, shuffle parallelism sized to the cluster, the graft SQL
  * functions registered, and the parquet nanos escape hatch the test
  * tables need. `spark.sql.extensions=graft.expressions.GraftExtensions`
  * achieves the function registration declaratively instead.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // AQE coalesces by shuffle BYTES; compute-dense narrow rows (hash
      // sets, LSH postings) can collapse a heavy stage onto one task at the
      // default 1 MB floor. 64k keeps coalescing for genuinely empty
      // partitions while preserving parallelism for small-but-hot data.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    spark
  }
}
