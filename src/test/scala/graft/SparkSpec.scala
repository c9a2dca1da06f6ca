package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Run `sql` over a fresh JDBC connection and map each row of the result
    * — the shared scaffolding of every warehouse-delivery spec (connect /
    * query / iterate / close, with the mapping completed INSIDE the try).
    */
  def jdbcRows[A](url: String, sql: String)(f: java.sql.ResultSet => A): Seq[A] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        try Iterator.continually(rs).takeWhile(_.next()).map(f).toVector
        finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  /** Count shuffle exchanges in the final adaptive plan after running
    * `df` (stage plans are fields, not children, so descend explicitly).
    * The scale contracts ("ONE shuffle of the event log") are pinned with
    * this — a plan regression fails the suite, not just the benchmarks.
    */
  def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p.map {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        go(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(s.plan)
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
      case _ => 0
    }.sum
    go(df.queryExecution.executedPlan)
  }

  /** Count SINGLE-PARTITION window operators (WindowExec with an empty
    * partition spec — every row through one task) in the final adaptive
    * plan. The scale-killer class the heaps_law fix removed; operators
    * claiming "no global window" pin this at 0.
    */
  def globalWindows(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p.map {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        go(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(s.plan)
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => 1
      case _ => 0
    }.sum
    go(df.queryExecution.executedPlan)
  }

  /** Execute DDL/DML statements over a fresh JDBC connection. */
  def jdbcExec(url: String, sqls: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.executeUpdate) finally st.close()
    } finally conn.close()
  }

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
