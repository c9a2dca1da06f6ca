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
}
