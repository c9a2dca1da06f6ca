package graft

import graft.sources.{Incremental, TableConfig}
import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

/** The JDBC capture seam against a REAL database: embedded Apache Derby
  * (shipped with Spark for the Hive metastore) stands in for the Postgres
  * instance the reference tails (quickstart_prepare_peers.sh:24-78 creates
  * customers/products/orders with serial keys). Proves the two properties a
  * paper-only assembly of `spark.read.jdbc` can't: the watermark predicate
  * actually reaches the database (as a pushed filter / inlined WHERE, so a
  * poll streams only the delta instead of the table), and the
  * snapshot → insert → poll cycle drains a live table to lag 0.
  */
class JdbcCaptureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbHome = {
    val home = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", home)
    home
  }
  private lazy val url = { dbHome; s"jdbc:derby:graftdb;create=true" }
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.executeUpdate) finally st.close()
    } finally conn.close()
  }

  private def mkTable(name: String, rows: Seq[(Long, Long, String)]): Unit =
    exec((s"CREATE TABLE $name (id BIGINT PRIMARY KEY, seq BIGINT NOT NULL, " +
      "payload VARCHAR(64))") +:
      rows.map { case (id, seq, p) =>
        s"INSERT INTO $name VALUES ($id, $seq, '$p')"
      }: _*)

  private def jdbcTable(name: String) = spark.read.jdbc(url, name, props)

  test("jdbcIncrement inlines the watermark WHERE so the database streams only the delta") {
    mkTable("inc_t", (1L to 50L).map(i => (i, i, s"p$i")))
    val delta = Incremental.jdbcIncrement(spark, url, "inc_t", "seq", 40L, props)
    // the WHERE travels inside the dbtable subquery — visible in the scan's
    // relation, meaning Derby (not Spark) filters the 40 below-watermark rows
    val scan = delta.queryExecution.executedPlan.toString
    assert(scan.contains("WHERE seq > 40"), s"watermark WHERE not in the JDBC relation:\n$scan")
    assert(delta.select("ID").as[Long].collect().toSet == (41L to 50L).toSet)
  }

  test("a plain jdbc source pushes the poll's watermark filter down to the database") {
    mkTable("push_t", (1L to 30L).map(i => (i, i, s"p$i")))
    // poll's internal shape: full-table jdbc relation + seq > watermark —
    // Spark must push the predicate into the JDBC scan (PushedFilters), the
    // exact mechanism that keeps a 100 TB-source poll delta-sized
    val delta = jdbcTable("push_t")
      .where(org.apache.spark.sql.functions.col("seq").cast("long") > 25L)
    val scan = delta.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(SEQ,25)"),
      s"watermark filter not pushed to JDBC:\n$scan")
    assert(delta.count() == 5L)
  }

  test("snapshot + polls drain a live Derby table to lag 0, state resumed from disk") {
    mkTable("customers", (1L to 20L).map(i => (i, i, s"c$i")))
    val dir = Files.createTempDirectory("graft_jdbc_mirror").toString + "/customers"
    val cfg = TableConfig("customers", Seq("ID"), "SEQ", nBuckets = 4)

    val st0 = Incremental.snapshot(jdbcTable("customers"), cfg, dir)
    assert(st0.watermark == 20L)

    // live writes: two inserts and one update, all above the watermark
    exec(
      "INSERT INTO customers VALUES (21, 21, 'c21')",
      "INSERT INTO customers VALUES (22, 22, 'c22')",
      "UPDATE customers SET seq = 23, payload = 'u5' WHERE id = 5")

    val before = Incremental.lagReport(jdbcTable("customers"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "lag_seq", "sync_status")
      .as[(Long, Long, String)].collect()(0)
    assert(before == ((2L, 3L, "NEAR_SYNC")))

    val r1 = Incremental.poll(jdbcTable("customers"), cfg, dir)
    assert(r1.rowsSynced == 3L && r1.state.watermark == 23L && r1.state.batchId == 1L)

    val fin = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID", "SEQ", "PAYLOAD").as[(Long, Long, String)].collect().toSet
    val truth = {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT id, seq, payload FROM customers")
        Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSet
      } finally conn.close()
    }
    assert(fin == truth)

    val after = Incremental.lagReport(jdbcTable("customers"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "lag_seq", "sync_status")
      .as[(Long, Long, String)].collect()(0)
    assert(after == ((0L, 0L, "SYNCED")))

    // an idle poll against the live table is a no-op
    val idle = Incremental.poll(jdbcTable("customers"), cfg, dir)
    assert(idle.rowsSynced == 0L && idle.state == r1.state)
  }

  test("hard DELETEs drain to lag 0 via key reconciliation and survive re-insert") {
    mkTable("accounts", (1L to 10L).map(i => (i, i, s"a$i")))
    val dir = Files.createTempDirectory("graft_jdbc_del").toString + "/accounts"
    val cfg = TableConfig("accounts", Seq("ID"), "SEQ", nBuckets = 4)
    val st0 = Incremental.snapshot(jdbcTable("accounts"), cfg, dir)
    assert(st0.watermark == 10L)

    // a physical purge: no change row, invisible to the versionCol tail
    exec("DELETE FROM accounts WHERE id IN (3, 7)")
    val poll0 = Incremental.poll(jdbcTable("accounts"), cfg, dir)
    assert(poll0.rowsSynced == 0L, "the seq tail must not see hard deletes")
    val before = Incremental.lagReport(jdbcTable("accounts"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "sync_status").as[(Long, String)].collect()(0)
    assert(before == ((-2L, "NEAR_SYNC")), "phantom negative lag before the sweep")

    val r1 = Incremental.reconcileDeletes(jdbcTable("accounts"), cfg, dir)
    assert(r1.rowsSynced == 2L && r1.state.watermark == st0.watermark
      && r1.state.batchId == st0.batchId + 1)
    val fin1 = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID").as[Long].collect().toSet
    assert(fin1 == ((1L to 10L).toSet -- Set(3L, 7L)), "deleted keys vanish from FINAL")
    val after = Incremental.lagReport(jdbcTable("accounts"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "sync_status").as[(Long, String)].collect()(0)
    assert(after == ((0L, "SYNCED")))

    // a sweep with nothing to reconcile is a no-op (state untouched)
    val idle = Incremental.reconcileDeletes(jdbcTable("accounts"), cfg, dir)
    assert(idle.rowsSynced == 0L && idle.state == r1.state)

    // re-insert of a deleted key: its fresh seq outranks the tombstone
    exec("INSERT INTO accounts VALUES (3, 11, 'back')")
    val r2 = Incremental.poll(jdbcTable("accounts"), cfg, dir)
    assert(r2.rowsSynced == 1L && r2.state.watermark == 11L)
    val fin2 = graft.sources.Mirror.readFinal(spark, dir, "ID")
      .select("ID", "SEQ", "PAYLOAD").as[(Long, Long, String)].collect().toSet
    assert(fin2.contains((3L, 11L, "back")) && fin2.size == 9)
    val synced = Incremental.lagReport(jdbcTable("accounts"),
        graft.sources.Mirror.readCommitted(spark, dir), cfg)
      .select("lag_rows", "sync_status").as[(Long, String)].collect()(0)
    assert(synced == ((0L, "SYNCED")))
  }
}
