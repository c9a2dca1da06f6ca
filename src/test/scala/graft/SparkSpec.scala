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
