package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-sizing exchange rule (GraftSession class doc):
  *
  *   partitions = clamp(inputBytes · expansion / targetBytes,
  *                      floor = spark.sql.shuffle.partitions,
  *                      ceiling = floor × 16)
  *
  * applied by the exchange-heavy operators via
  * [[GraftSession.sizedPartitions]] (the count) and
  * [[GraftSession.sizedExchanges]] (a child session whose IMPLICIT
  * exchanges start at that count, with the advisory and skew-split
  * thresholds scaled to the operator's target weight). Small input →
  * exactly the floor and the ORIGINAL session (identity — bench-SF plans
  * and timings unchanged); big input → partitions track bytes.
  */
class ExchangeSizingSpec extends AnyFunSuite {

  test("sizedPartitions: floor at small bytes, bytes/target in the middle, ceiling caps") {
    val spark = GraftSession.builder("local[2]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val dir = java.nio.file.Files.createTempDirectory("sizing").toString
      spark.range(20000).select(col("id"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string"))).as("pad"))
        .coalesce(1).write.parquet(s"$dir/t")
      val df = spark.read.parquet(s"$dir/t") // ~1.4 MB of hash noise
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
      assert(bytes > 500000L, s"fixture too small: $bytes")
      // small: clamps up to the floor
      assert(GraftSession.sizedPartitions(df) === 4)
      // middle: ceil(bytes*64 / 1MB) between floor and ceiling
      val exp = math.ceil(bytes * 64.0 / (1L << 20)).toInt
      assert(exp > 4 && exp < 64, s"fixture off the middle band: $exp")
      assert(GraftSession.sizedPartitions(df, expansion = 64.0,
        targetBytes = 1L << 20) === exp)
      // huge expansion: clamps down to floor × 16
      assert(GraftSession.sizedPartitions(df, expansion = 1e9) ===
        4 * GraftSession.PartitionCeilingFactor)
      assert(GraftSession.PartitionCeilingFactor === 16)
    } finally spark.stop()
  }

  test("sizedExchanges: identity at the floor; sized child session above it") {
    val spark = GraftSession.builder("local[2]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      val df = Seq(1, 2, 3).toDF("x").groupBy(col("x")).count()
      // at or below the floor: the SAME frame back — zero-cost small path
      assert(GraftSession.sizedExchanges(df, 4) eq df)
      assert(GraftSession.sizedExchanges(df, 2) eq df)
      // above: a child session carrying the sized initial partition count,
      // the operator's advisory weight, and the scaled skew-split trigger;
      // the parent session's confs are untouched
      val sized = GraftSession.sizedExchanges(df, 40, targetBytes = 4L << 20)
      val c = sized.sparkSession.conf
      assert(c.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum") === "40")
      assert(c.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") === (4L << 20).toString)
      assert(c.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes") === (8L << 20).toString)
      assert(spark.conf.getOption(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum").isEmpty)
      // same rows either way
      assert(sized.collect().toSet === df.collect().toSet)
    } finally spark.stop()
  }

  test("session wiring: floor, 64 MB advisory, AQE + skew join on") {
    val spark = GraftSession.builder("local[2]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val conf = spark.conf
      assert(conf.get("spark.sql.shuffle.partitions") === "8")
      assert(GraftSession.parallelismFloor(spark) === 8)
      assert(conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") === "64m")
      assert(conf.get("spark.sql.adaptive.enabled") === "true")
      assert(conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize") === "64k")
    } finally spark.stop()
  }
}
