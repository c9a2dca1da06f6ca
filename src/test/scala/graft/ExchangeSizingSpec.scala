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
  *
  * Every session here is a `newSession()` of the suite-shared context
  * with [[GraftSession.sessionConfs]] applied — NEVER a stopped private
  * context (a `spark.stop()` inside one suite kills every concurrently
  * running suite in the shared test JVM).
  */
class ExchangeSizingSpec extends AnyFunSuite {

  private def sized(floor: Int) = {
    val s = SparkSpec.session.newSession()
    GraftSession.sessionConfs(floor).foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  test("session wiring: floor, 64 MB advisory, AQE + skew join on") {
    val s = sized(8)
    assert(s.conf.get("spark.sql.shuffle.partitions") === "8")
    assert(GraftSession.parallelismFloor(s) === 8)
    assert(s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") === "64m")
    assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(s.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize")
      === "64k")
    // builder() applies the same wiring (pinned through the shared map —
    // a builder-made session would own a context; the map IS the contract)
    assert(GraftSession.sessionConfs(8).toMap
      .get("spark.sql.shuffle.partitions") === Some("8"))
  }

  test("sizedPartitions: floor at small bytes, bytes/target in the middle, ceiling caps") {
    val spark = sized(4)
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
    // the bytes-based core agrees with the frame form
    assert(GraftSession.sizedPartitionsFromBytes(spark, BigInt(bytes), 64.0,
      1L << 20) === exp)
    // huge expansion: clamps down to floor × 16
    assert(GraftSession.sizedPartitions(df, expansion = 1e9) ===
      4 * GraftSession.PartitionCeilingFactor)
    assert(GraftSession.PartitionCeilingFactor === 16)
  }

  test("sizedExchanges: identity at the floor; sized child session above it") {
    val spark = sized(4)
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").groupBy(col("x")).count()
    // at or below the floor: the SAME frame back — zero-cost small path
    assert(GraftSession.sizedExchanges(df, 4) eq df)
    assert(GraftSession.sizedExchanges(df, 2) eq df)
    // above: a child session carrying the sized initial partition count,
    // the operator's advisory weight, and the scaled skew-split trigger;
    // the parent session's confs are untouched
    val szd = GraftSession.sizedExchanges(df, 40, targetBytes = 4L << 20)
    val c = szd.sparkSession.conf
    assert(c.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum") === "40")
    assert(c.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") === (4L << 20).toString)
    assert(c.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes") === (8L << 20).toString)
    assert(spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum").isEmpty)
    // same rows either way
    assert(szd.collect().toSet === df.collect().toSet)
  }

  test("big shuffle sizes from bytes, small shuffle coalesces to ~floor") {
    // floor 2, ceiling 32; advisory shrunk to 256k so ~7 MB of shuffle
    // bytes stands in for the  bytes >> advisory·floor  regime
    val spark = sized(2)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
    // grouping key: effectively-unique hash noise — map-side combine
    // can't shrink the exchange, shuffle lz4 can't compress it away, and
    // (unlike grouping on range's `id`) the optimizer can't prove
    // uniqueness and delete the exchange outright
    val big = spark.range(60000).select(
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string"))).as("pad"))
      .groupBy(col("pad")).agg(count(lit(1)).as("n"))
    big.collect()
    val nBig = big.rdd.getNumPartitions
    assert(nBig > 2,
      s"a shuffle far past advisory x floor stayed at $nBig partitions " +
        "- exchanges are NOT self-sizing")
    assert(nBig <= 32, s"$nBig partitions exceeds the configured ceiling")

    // a tiny shuffle must keep coalescing down (no 32-task overhead on
    // kilobyte inputs): the old small-SF behavior is preserved
    val small = spark.range(100)
      .select(md5(col("id").cast("string")).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("s"))
    small.collect()
    assert(small.rdd.getNumPartitions <= 2)
  }
}
