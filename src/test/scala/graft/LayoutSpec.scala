package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("monthly layout prunes partitions at planning time") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/t"
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    Layout.writeMonthly(li, "l_shipdate", dir)

    val all = Layout.readMonthly(spark, dir)
    val one = all.where(col("part_month") === "1996-03")

    // correctness: filtered read equals the in-memory filter
    val expected = li.where(date_format(col("l_shipdate"), "yyyy-MM") === "1996-03").count()
    assert(one.count() == expected && expected > 0)

    // pruning: the filtered scan lists exactly one partition directory,
    // the unfiltered scan lists all of them
    def partitionCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.get
    assert(partitionCount(one) == 1,
      s"expected 1 pruned partition, scanned ${partitionCount(one)}")
    assert(partitionCount(all) > 12) // several years of months present
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join and aggregate with zero shuffles") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val sf = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, sf, "orders")
    val li = Tables.load(spark, sf, "lineitem")
    try {
      Layout.writeBucketed(orders, "graft_b_orders", s"$dir/orders", "o_orderkey", 8)
      Layout.writeBucketed(li, "graft_b_lineitem", s"$dir/lineitem", "l_orderkey", 8)

      // forbid broadcast so the join must co-locate, not ship a side
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
               "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        def joined(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
          o.join(l, col("o_orderkey") === col("l_orderkey"))
            .groupBy(col("o_orderkey"))
            .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))

        val bucketed = joined(Layout.readTable(spark, "graft_b_orders"),
          Layout.readTable(spark, "graft_b_lineitem"))
        val plain = joined(orders, li)

        // same answer, but the bucketed plan needs no exchange at all:
        // the join consumes the bucket partitioning and the aggregation
        // reuses it (its key IS the bucket key)
        assert(bucketed.count() == plain.count())
        assert(shuffles(plain) > 0, "plain parquet join should shuffle")
        assert(shuffles(bucketed) == 0,
          s"bucketed join must be shuffle-free:\n${bucketed.queryExecution.executedPlan}")

        // a plain file read of the same directory loses the bucket spec —
        // the catalog read is the contract, and this is why
        val raw = joined(spark.read.parquet(s"$dir/orders"),
          spark.read.parquet(s"$dir/lineitem"))
        assert(shuffles(raw) > 0, "bypassing the catalog should reintroduce the shuffle")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }

  test("z-ordered layout clusters every z-column for scan-time skipping") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("value"))

    Layout.writeZOrdered(ev, Seq("user_id", "value"), s"$dir/z", numFiles = 16)
    // baseline: same data, same file count, no clustering
    ev.repartition(16).write.parquet(s"$dir/flat")

    // per-file min/max envelope width of `c`, averaged over files, as a
    // fraction of the global range — what parquet stats-based skipping sees
    def meanSpan(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
        .select(col(c).cast("double").as("v"),
          input_file_name().as("f"))
      val Array(lo, hi) = df.agg(min(col("v")), max(col("v")))
        .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
      val spans = df.groupBy(col("f"))
        .agg((max(col("v")) - min(col("v"))).as("span"))
        .collect().map(_.getDouble(1))
      spans.sum / spans.length / (hi - lo)
    }

    // nothing lost, nothing reordered away
    assert(spark.read.parquet(s"$dir/z").count() == ev.count())

    for (c <- Seq("user_id", "value")) {
      val z = meanSpan(s"$dir/z", c)
      val flat = meanSpan(s"$dir/flat", c)
      assert(z < 0.5 && z < flat * 0.6,
        s"$c: z-order mean file span $z should be well under flat $flat")
    }
  }

  test("stats manifest skips files driver-side; result stays exact") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // clustered layout → tight per-file envelopes worth skipping over
    Layout.writeZOrdered(ev, Seq("user_id", "value"), dir, numFiles = 16)
    Layout.writeStatsManifest(spark, dir, Seq("user_id", "value"))

    def files(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(input_file_name()).distinct().as[String].collect().toSet

    val skimmed = Layout.readSkipping(spark, dir, "user_id", 10L, 20L)
    val full = spark.read.parquet(dir).where(col("user_id").between(10L, 20L))
    // exactness: identical rows
    assert(skimmed.select(col("event_id")).as[Long].collect().sorted.toSeq ==
      full.select(col("event_id")).as[Long].collect().sorted.toSeq)
    assert(skimmed.count() > 0)
    // the skip: strictly fewer files opened than the full scan's 16
    val opened = files(Layout.readSkipping(spark, dir, "user_id", 10L, 20L))
    assert(opened.size < 16, s"no files were skipped: ${opened.size}")

    // a second tracked column skips too (the z-layout clusters both)
    val byValue = Layout.readSkipping(spark, dir, "value", 0.0, 5.0)
    assert(byValue.count() ==
      spark.read.parquet(dir).where(col("value").between(0.0, 5.0)).count())
    assert(files(Layout.readSkipping(spark, dir, "value", 0.0, 5.0)).size < 16)

    // an empty range survives (schema preserved, zero rows)
    val none = Layout.readSkipping(spark, dir, "user_id", -500L, -400L)
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("event_id", "user_id", "value"))
  }

  test("stats manifest skipping recovers partition columns on a monthly layout") {
    val dir = Files.createTempDirectory("graft_skip_part").toString + "/t"
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    Layout.writeMonthly(li, "l_shipdate", dir)
    Layout.writeStatsManifest(spark, dir, Seq("part_month", "l_quantity"))

    // partition columns survive the file-list read (the basePath contract)
    val byMonth = Layout.readSkipping(spark, dir, "part_month", "1996-01", "1996-03")
    assert(byMonth.columns.contains("part_month"),
      s"partition column lost: ${byMonth.columns.mkString(",")}")

    // exactness vs the plain partitioned read, filtering ON the partition col
    val full = spark.read.parquet(dir)
      .where(col("part_month").between("1996-01", "1996-03"))
    assert(byMonth.count() == full.count() && full.count() > 0)

    // the skip is real: fewer files opened than the layout holds
    def files(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    val allFiles = files(spark.read.parquet(dir))
    assert(files(byMonth).size < allFiles.size,
      s"no files skipped: ${files(byMonth).size} of ${allFiles.size}")

    // a non-partition range column also works on the partitioned layout,
    // and the result still carries the partition column
    val byQty = Layout.readSkipping(spark, dir, "l_quantity", 1.0, 2.0)
    val fullQty = spark.read.parquet(dir).where(col("l_quantity").between(1.0, 2.0))
    assert(byQty.count() == fullQty.count() && byQty.columns.contains("part_month"))
  }

  test("skipping pins partition types and survives encodable partition values") {
    val dir = Files.createTempDirectory("graft_skip_enc").toString + "/t"
    // k's values are type-ambiguous ("01" alone would infer as int) and
    // carry every character class input_file_name() URL-encodes; each
    // partition owns a disjoint v range so the prune isolates single dirs
    val rows = Seq(
      ("01", 1L, 5.0), ("01", 2L, 7.0),
      ("a b", 3L, 105.0), ("x%y", 4L, 205.0), ("c#d", 5L, 305.0))
    rows.toDF("k", "id", "v").write.partitionBy("k").parquet(dir)
    Layout.writeStatsManifest(spark, dir, Seq("v"))

    // prune down to ONLY the numeric-looking partition: subset-side
    // inference would type k as int; the pinned schema keeps the full
    // read's string — values compare as written
    val only01 = Layout.readSkipping(spark, dir, "v", 0.0, 10.0)
    assert(only01.schema("k").dataType ==
      spark.read.parquet(dir).schema("k").dataType)
    assert(only01.select(col("k")).distinct().as[String].collect().toSeq == Seq("01"))
    assert(only01.count() === 2)

    // each encodable partition value resolves through the decoded path
    for ((v, k) <- Seq((105.0, "a b"), (205.0, "x%y"), (305.0, "c#d"))) {
      val got = Layout.readSkipping(spark, dir, "v", v - 1, v + 1)
        .select(col("k")).as[String].collect().toSeq
      assert(got == Seq(k), s"partition value $k did not survive the round trip: $got")
    }

    // the empty-range branch serves the pinned schema without listing
    val none = Layout.readSkipping(spark, dir, "v", -50.0, -40.0)
    assert(none.count() === 0 && none.columns.contains("k"))
  }

  test("skipping matches literal glob metacharacters in path segments") {
    // Spark's own partitionBy escapes glob chars in directory names, but a
    // hand-laid hive layout can carry them literally — and read.parquet
    // pattern-expands its path arguments, so an unescaped k=v[12] would
    // match sibling dirs k=v1/ and k=v2/ (or nothing) instead of itself
    val dir = Files.createTempDirectory("graft_skip_glob").toString + "/t"
    def drop(sub: String, rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v").write.parquet(s"$dir/k=$sub")
    drop("v1", Seq((1L, 5.0)))
    drop("v2", Seq((2L, 15.0)))
    drop("v[12]", Seq((3L, 105.0), (4L, 107.0)))
    drop("v{a,b}", Seq((5L, 205.0)))
    Layout.writeStatsManifest(spark, dir, Seq("v"))

    val bracket = Layout.readSkipping(spark, dir, "v", 100.0, 110.0)
      .select(col("id"), col("k")).as[(Long, String)].collect().toSet
    assert(bracket == Set((3L, "v[12]"), (4L, "v[12]")),
      s"glob chars mis-expanded: $bracket")
    val brace = Layout.readSkipping(spark, dir, "v", 200.0, 210.0)
      .select(col("id"), col("k")).as[(Long, String)].collect().toSet
    assert(brace == Set((5L, "v{a,b}")), s"brace glob mis-expanded: $brace")
    // the plain partitions are untouched by the escaping
    assert(Layout.readSkipping(spark, dir, "v", 0.0, 20.0).count() === 2)
  }
}
