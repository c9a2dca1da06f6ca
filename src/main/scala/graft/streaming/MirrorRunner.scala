package graft.streaming

import graft.sources.{Incremental, MultiTableMirror, TableConfig}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum, when}

/** Declarative, config-file-driven mirror orchestration — the missing last
  * mile between the engine's mirror machinery and the way the reference is
  * actually OPERATED: PeerDB users define a mirror as configuration (a
  * spec naming source tables, target, and modes — peerdb_config.yaml:40-52
  * `expected_tables`, quickstart_prepare_peers.sh:24-47's multi-table
  * publication; PeerDB's own surface is `CREATE MIRROR` DDL), never as
  * code that hand-assembles capture loops. [[MirrorConfig.load]] parses a
  * small YAML-subset spec; [[MirrorRunner]] wires snapshot bootstrap →
  * capture rounds → warehouse sink from it and adds the mirror lifecycle
  * verbs the PeerDB UI/monitor expose (status / pause / resume / drop —
  * peerdb_psql_clickhouse_monitor.ps1:112's menu).
  *
  * == Config format ==
  * {{{
  * mirror: orders_mirror
  * source_url: jdbc:derby:graftdb
  * target_dir: /data/mirror
  * sink_url: jdbc:derby:warehouse     # optional warehouse delivery
  * sink_dual: derby                   # optional: ansi (default) | derby
 * sink_evolve: true                  # optional: ADD drifted mirror columns
 *                                    #   to the warehouse target (default false)
  * reconcile_deletes: true            # optional, default false
  * tables:
  *   - name: customers
  *     keys: [id]
  *     version_col: seq
  *     buckets: 8                     # optional, default 64
  *     exclude: [ssn]                 # optional column exclusions
  *     target: wh_customers           # optional sink table name
  *   - name: orders
  *     keys: [oid]
  *     version_col: seq
  * }}}
  *
  * The subset is deliberately small (scalars, `[a, b]` inline lists, one
  * block list of maps) and the parser REFUSES anything outside it with the
  * offending line — a typo'd mirror spec must fail at load, not silently
  * capture the wrong shape. No YAML library exists in the sealed build
  * environment; this parser covers exactly the shapes above.
  *
  * == Restart safety ==
  * Every piece of runner state is on disk: capture watermarks/batch ids in
  * each table's sync state file ([[Incremental.readState]]), committed
  * data behind [[SyncManifest]], pause flags as per-table marker files
  * under the mirror root. A crashed or restarted process re-creates the
  * runner from the SAME config file and resumes: fresh tables snapshot,
  * seasoned tables poll from their persisted watermark, paused tables stay
  * paused.
  */
final case class MirrorTableSpec(name: String, keys: Seq[String],
                                 versionCol: String, buckets: Int,
                                 exclude: Seq[String], target: String) {
  def toTableConfig: TableConfig =
    TableConfig(name, keys, versionCol, buckets, exclude)
}

final case class MirrorConfig(mirror: String, sourceUrl: String,
                              targetDir: String, sinkUrl: Option[String],
                              sinkDual: String,
                              reconcileDeletes: Boolean,
                              tables: Seq[MirrorTableSpec],
                              sinkEvolve: Boolean = false) {
  require(mirror.nonEmpty, "mirror name must be non-empty")
  require(sourceUrl.nonEmpty, "source_url must be non-empty")
  require(targetDir.nonEmpty, "target_dir must be non-empty")
  require(tables.nonEmpty, "a mirror needs at least one table")
  require(tables.map(_.name).distinct.size == tables.size,
    s"duplicate table names in mirror config: ${tables.map(_.name)}")

  /** The pgoutput-path twin of the polling wiring: the same per-table spec
    * as [[PgOutputStream.TableSpec]]s for [[PgOutputStream.mirrorFramesMulti]]
    * when the source is a replication-frame stream instead of a pollable
    * JDBC relation (a frames DataFrame cannot be conjured from config — the
    * caller supplies it; everything else comes from here).
    */
  def toFrameSpecs: Seq[PgOutputStream.TableSpec] =
    tables.map(t => PgOutputStream.TableSpec(t.name, t.keys, t.buckets))
}

object MirrorConfig {

  /** Parse a config from a file path (any Hadoop-visible filesystem). */
  def load(spark: SparkSession, path: String): MirrorConfig = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(text)
  }

  def parse(text: String): MirrorConfig = {
    // strip comments/blanks, keep 1-based line numbers for errors
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.replaceAll("#.*$", ""), i + 1) }
      .filter(_._1.trim.nonEmpty).toVector
    def fail(ln: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"mirror config line $ln: $msg")
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }
    def inlineList(v: String, ln: Int): Seq[String] = {
      val t = v.trim
      if (!(t.startsWith("[") && t.endsWith("]")))
        fail(ln, s"expected an inline [a, b] list, got '$v'")
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) Nil
      else body.split(",").map(unquote).toSeq
    }
    // top-level scalars + the one `tables:` block list of maps
    var mirror, sourceUrl, targetDir = ""
    var sinkUrl: Option[String] = None
    var sinkDual = graft.sinks.JdbcSink.AnsiDual
    var sinkEvolve = false
    var reconcile = false
    val tables = Seq.newBuilder[MirrorTableSpec]
    var i = 0
    def indentOf(s: String): Int = s.takeWhile(_ == ' ').length
    while (i < lines.length) {
      val (line, ln) = lines(i)
      if (indentOf(line) != 0) fail(ln, s"unexpected indentation: '${line.trim}'")
      val kv = line.split(":", 2)
      if (kv.length != 2) fail(ln, s"expected 'key: value', got '${line.trim}'")
      val (key, value) = (kv(0).trim, kv(1).trim)
      key match {
        case "mirror" => mirror = unquote(value); i += 1
        case "source_url" => sourceUrl = unquote(value); i += 1
        case "target_dir" => targetDir = unquote(value); i += 1
        case "sink_url" => sinkUrl = Some(unquote(value)).filter(_.nonEmpty); i += 1
        case "sink_evolve" => sinkEvolve = unquote(value).toLowerCase match {
          case "true" => true
          case "false" => false
          case other => fail(ln, s"sink_evolve must be true or false, got '$other'")
        }; i += 1
        case "sink_dual" => sinkDual = unquote(value).toLowerCase match {
          case "ansi" => graft.sinks.JdbcSink.AnsiDual
          case "derby" => graft.sinks.JdbcSink.DerbyDual
          case other => fail(ln, s"sink_dual must be ansi or derby, got '$other'")
        }; i += 1
        case "reconcile_deletes" =>
          reconcile = value.toLowerCase == "true"; i += 1
        case "tables" =>
          if (value.nonEmpty) fail(ln, "tables: must start a block list")
          i += 1
          // each item: "- name: x" then deeper-indented keys
          while (i < lines.length && lines(i)._1.trim.startsWith("- ")) {
            val (item, iln) = lines(i)
            val itemIndent = indentOf(item)
            val fields = scala.collection.mutable.Map[String, (String, Int)]()
            def put(l: String, lnn: Int): Unit = {
              val f = l.split(":", 2)
              if (f.length != 2) fail(lnn, s"expected 'key: value', got '$l'")
              fields(f(0).trim) = (f(1).trim, lnn)
            }
            put(item.trim.drop(2), iln)
            i += 1
            while (i < lines.length && indentOf(lines(i)._1) > itemIndent &&
              !lines(i)._1.trim.startsWith("- ")) {
              put(lines(i)._1.trim, lines(i)._2)
              i += 1
            }
            def req(k: String): (String, Int) = fields.getOrElse(k,
              fail(iln, s"table entry missing required field '$k'"))
            val name = unquote(req("name")._1)
            val keys = inlineList(req("keys")._1, req("keys")._2)
            if (keys.isEmpty) fail(req("keys")._2, "keys must be non-empty")
            val spec = MirrorTableSpec(
              name = name,
              keys = keys,
              versionCol = unquote(req("version_col")._1),
              buckets = fields.get("buckets").map { case (v, vln) =>
                try v.toInt catch { case _: NumberFormatException =>
                  fail(vln, s"buckets must be an int, got '$v'") }
              }.getOrElse(64),
              exclude = fields.get("exclude")
                .map { case (v, vln) => inlineList(v, vln) }.getOrElse(Nil),
              target = fields.get("target").map(f => unquote(f._1))
                .getOrElse(name))
            val known = Set("name", "keys", "version_col", "buckets",
              "exclude", "target")
            fields.keys.find(!known(_)).foreach(k =>
              fail(fields(k)._2, s"unknown table field '$k' (known: " +
                s"${known.toSeq.sorted.mkString(", ")})"))
            tables += spec
          }
        case other => fail(ln, s"unknown top-level key '$other' (known: " +
          "mirror, source_url, target_dir, sink_url, sink_dual, " +
          "sink_evolve, reconcile_deletes, tables)")
      }
    }
    MirrorConfig(mirror, sourceUrl, targetDir, sinkUrl, sinkDual, reconcile,
      tables.result(), sinkEvolve = sinkEvolve)
  }
}

/** One running (or resumable) mirror defined entirely by a [[MirrorConfig]].
  * See the file doc for the operational model. All verbs are safe to call
  * from a fresh runner over an existing mirror root — state is disk-only.
  */
final class MirrorRunner(spark: SparkSession, val cfg: MirrorConfig,
                         connectionProps: java.util.Properties = new java.util.Properties()) {

  private def dir(table: String): String = s"${cfg.targetDir}/$table"
  private def pauseFlag(table: String): Path =
    new Path(cfg.targetDir, s"_graft_paused_$table")
  private def fs = new Path(cfg.targetDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def spec(table: String): MirrorTableSpec =
    cfg.tables.find(_.name == table).getOrElse(throw new IllegalArgumentException(
      s"table $table not in mirror ${cfg.mirror} (configured: " +
        s"${cfg.tables.map(_.name).mkString(", ")})"))

  private def source(table: String): DataFrame =
    spark.read.jdbc(cfg.sourceUrl, table, connectionProps)

  /** Per-table status: `fresh` (no capture state yet), `active`, or
    * `paused`. Cheap — reads only the state and flag files, never data.
    */
  def status(): Seq[MirrorRunner.TableStatus] = cfg.tables.map { t =>
    val st = Incremental.readState(spark, dir(t.name))
    val state =
      if (fs.exists(pauseFlag(t.name))) "paused"
      else if (st.isEmpty) "fresh"
      else "active"
    MirrorRunner.TableStatus(t.name, state, st.map(_.watermark),
      st.map(_.batchId), st.map(_.syncedAtMs))
  }

  /** Pause capture for one table (persisted — survives restarts). Paused
    * tables are skipped by [[runOnce]]; their mirror stays readable at its
    * last committed sync.
    */
  def pause(table: String): Unit = {
    spec(table)
    val out = fs.create(pauseFlag(table), true)
    try out.writeLong(System.currentTimeMillis()) finally out.close()
  }

  /** Resume capture for one table: the next [[runOnce]] polls it from its
    * persisted watermark (or snapshots it if it was paused while fresh).
    */
  def resume(table: String): Unit = {
    spec(table)
    fs.delete(pauseFlag(table), false)
    ()
  }

  /** Drop one table's mirror: its data directory, capture state, and pause
    * flag. The table stays configured — the next [[runOnce]] re-snapshots
    * it from the source (PeerDB's resync); remove it from the config file
    * to stop mirroring it for good.
    */
  def drop(table: String): Unit = {
    spec(table)
    fs.delete(new Path(dir(table)), true)
    fs.delete(pauseFlag(table), false)
    ()
  }

  /** One capture round over every non-paused table: fresh tables take
    * their initial snapshot, seasoned tables poll their delta (plus a
    * hard-delete reconcile sweep when configured), and — when a sink is
    * configured — each table's new mirror delta lands in its warehouse
    * target. Concurrent across tables with the [[MultiTableMirror]]
    * machinery; per-table state commits independently, so a failed table
    * re-syncs next round without disturbing the others.
    */
  def runOnce(): Unit = {
    val active = cfg.tables.filter(t => !fs.exists(pauseFlag(t.name)))
    if (active.isEmpty) return
    val (fresh, seasoned) = active.partition(t =>
      Incremental.readState(spark, dir(t.name)).isEmpty)
    if (fresh.nonEmpty)
      new MultiTableMirror(spark, fresh.map(_.toTableConfig), source,
        cfg.targetDir).snapshotAll()
    if (seasoned.nonEmpty) {
      val mm = new MultiTableMirror(spark, seasoned.map(_.toTableConfig),
        source, cfg.targetDir)
      mm.pollAll()
      if (cfg.reconcileDeletes) mm.reconcileAll()
    }
    cfg.sinkUrl.foreach { sink =>
      new MultiTableMirror(spark, active.map(_.toTableConfig), source,
        cfg.targetDir).sinkAll(sink, connectionProps,
        targetOf = t => spec(t).target, dual = cfg.sinkDual,
        evolve = cfg.sinkEvolve)
    }
  }

  /** FINAL read of one mirrored table (newest version per key, soft
    * deletes hidden), pinned to the last committed sync.
    */
  def readFinal(table: String): DataFrame =
    new MultiTableMirror(spark, Seq(spec(table).toTableConfig), source,
      cfg.targetDir).readFinal(table)

  /** The FRAME-path twin of [[runOnce]]: capture every configured table
    * from ONE multiplexed pgoutput replication-frame stream (the
    * publication-over-one-slot shape) through
    * [[PgOutputStream.mirrorFramesMulti]], with the per-table specs
    * derived from the SAME config file ([[MirrorConfig.toFrameSpecs]]) —
    * a deployment switches a mirror between the polling and the
    * replication-slot transport by changing how frames arrive, not its
    * configuration. Mirrors land under `targetDir/frames/<table>` (the
    * polling path owns `targetDir/<table>`), dead letters under
    * `targetDir/frames_dead/<table>`, the streaming checkpoint under
    * `targetDir/frames_ckpt`; all state is disk-only, so a fresh runner
    * over the same config file resumes the stream exactly (registry,
    * confirmed LSNs, checkpoint).
    */
  def runFrames(frames: DataFrame, dataCol: String = "data",
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    PgOutputStream.mirrorFramesMulti(frames, dataCol, cfg.toFrameSpecs,
      targetDir = s"${cfg.targetDir}/frames",
      checkpointDir = s"${cfg.targetDir}/frames_ckpt",
      deadRoot = Some(s"${cfg.targetDir}/frames_dead"), trigger = trigger)

  /** FINAL read of one frame-path mirrored table ([[runFrames]]). */
  def readFramesFinal(table: String): DataFrame =
    PgOutputStream.readFinal(spark, s"${cfg.targetDir}/frames/$table",
      spec(table).keys)

  /** ROW-LEVEL consistency audit of one mirrored table against the live
    * source (r19, the [[graft.sources.Mirror.auditBuckets]] verb wired to
    * the runner's config): per-bucket (row count, XOR of
    * xxhash64(keys, version) fingerprints) compare between the source
    * relation and the mirror FINAL. Catches in production what the r18
    * stress harness caught in test with its in-memory reference state —
    * a stale row behind green counts and green lag (the fenced-poll
    * lost-update shape). Two scans, bucket-bounded output, no data-row
    * shuffle; see auditBuckets for the mismatch taxonomy (a pending
    * un-reconciled hard delete also flags, by design).
    */
  def audit(table: String, buckets: Int = 256): DataFrame = {
    val t = spec(table)
    val src = source(table)
    // a monitor may call audit while the FIRST capture round is mid-write
    // (dir absent, or present without a committed footer): that mirror is
    // EMPTY, and the honest audit is src-vs-empty — every non-empty source
    // bucket flags — not an AnalysisException in the monitoring loop
    val fin =
      try readFinal(table)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if MirrorRunner.nothingCapturedYet(e) => src.limit(0)
      }
    graft.sources.Mirror.auditBuckets(src, fin, t.keys, t.versionCol, buckets)
  }

  /** The monitor-report form of [[audit]]: one row per non-paused synced
    * table — (table, buckets_mismatched, src_rows, mirror_rows, ok) —
    * the row-level column the count/lag report was missing. Belongs next
    * to [[lag]] in a monitoring loop; alert on `ok = false`.
    */
  def auditAll(buckets: Int = 256): DataFrame = {
    val active = cfg.tables.filter(t => !fs.exists(pauseFlag(t.name)))
      .filter(t => Incremental.readState(spark, dir(t.name)).nonEmpty)
    require(active.nonEmpty, "no active synced tables to audit")
    active.map { t =>
      audit(t.name, buckets)
        .agg(coalesceSum(when(!col("ok"), 1L).otherwise(0L))
            .as("buckets_mismatched"),
          coalesceSum(col("src_rows")).as("src_rows"),
          coalesceSum(col("mirror_rows")).as("mirror_rows"))
        .select(lit(t.name).as("table"), col("buckets_mismatched"),
          col("src_rows"), col("mirror_rows"),
          (col("buckets_mismatched") === 0L).as("ok"))
    }.reduce(_.unionByName(_))
  }

  /** The whole monitor row per table (r20, r19 verdict task 4): the lag
    * report JOINED with the row-level audit verdict — counts, watermarks,
    * sync status, AND the per-bucket fingerprint compare in ONE frame,
    * so a monitoring loop gets the stale-row column by default instead
    * of having to remember a second call. `audit = false` skips the two
    * extra scans per table for hot loops that only want lag.
    */
  def report(buckets: Int = 256, audit: Boolean = true): DataFrame = {
    val l = lag()
    if (!audit) l
    else l.join(auditAll(buckets)
        .select(col("table").as("table_name"),
          col("buckets_mismatched"), col("ok").as("audit_ok")),
      Seq("table_name"), "left")
  }

  /** sum() is null on an empty audit (both sides empty → zero buckets);
    * an empty mirrored table is consistent, so report zeros, not nulls. */
  private def coalesceSum(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.coalesce(sum(c), lit(0L))

  /** Per-table lag rows against the live source (non-paused tables). */
  def lag(): DataFrame = {
    val active = cfg.tables.filter(t => !fs.exists(pauseFlag(t.name)))
      .filter(t => Incremental.readState(spark, dir(t.name)).nonEmpty)
    require(active.nonEmpty, "no active synced tables to report lag for")
    new MultiTableMirror(spark, active.map(_.toTableConfig), source,
      cfg.targetDir).lagAll()
  }

  // ── continuous mode ──────────────────────────────────────────────────
  private val looping = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var loopThread: Thread = null
  @volatile private var lastError: Option[Throwable] = None

  /** Most recent [[runOnce]] failure in continuous mode (cleared by the
    * next successful round) — the monitorable health bit.
    */
  def lastRoundError: Option[Throwable] = lastError

  /** Run capture rounds continuously every `intervalMs` until [[stop]].
    * A failed round is recorded ([[lastRoundError]]) and the loop keeps
    * going — per-table state committed before the failure is durable, so
    * the next round resumes from it (the reference flow-worker's
    * keep-running-and-retry posture).
    */
  def start(intervalMs: Long): Unit = {
    require(intervalMs > 0, s"bad interval $intervalMs")
    if (!looping.compareAndSet(false, true))
      throw new IllegalStateException(s"mirror ${cfg.mirror} already running")
    val t = new Thread(() => {
      while (looping.get()) {
        try { runOnce(); lastError = None }
        catch { case e: Throwable =>
          lastError = Some(e)
          System.err.println(s"[mirror ${cfg.mirror}] round failed: $e")
        }
        val deadline = System.currentTimeMillis() + intervalMs
        while (looping.get() && System.currentTimeMillis() < deadline)
          Thread.sleep(math.min(50L, intervalMs))
      }
    }, s"graft-mirror-${cfg.mirror}")
    t.setDaemon(true)
    loopThread = t
    t.start()
  }

  /** Stop the continuous loop (the in-flight round completes its committed
    * work; nothing is torn — commits are per-table atomic).
    */
  def stop(): Unit = {
    looping.set(false)
    Option(loopThread).foreach(_.join(30000))
    loopThread = null
  }
}

object MirrorRunner {

  /** "Nothing captured yet" for a reader racing the FIRST capture commit:
    * the mirror directory is absent (`PATH_NOT_FOUND`) OR exists but
    * holds no committed parquet footer yet (`UNABLE_TO_INFER_SCHEMA` —
    * the mid-first-commit window, which only opens on a contended box;
    * the r19 catch matched only the absent-dir case and a full-suite run
    * failed through the gap). Matched on the error CONDITION, not message
    * text — message matching is brittle across Spark versions. A
    * permanently wrong `target_dir` also lands here by construction (no
    * read-time error can distinguish "not yet" from "never"); callers
    * that poll bound the misread with their own deadlines and fail
    * loudly on timeout instead of spinning forever.
    */
  private[graft] def nothingCapturedYet(
      e: org.apache.spark.sql.AnalysisException): Boolean =
    Option(e.getCondition).exists(c =>
      c == "PATH_NOT_FOUND" || c == "UNABLE_TO_INFER_SCHEMA")

  /** Lifecycle state of one table, drawn purely from disk. */
  final case class TableStatus(table: String, state: String,
                               watermark: Option[Long], batchId: Option[Long],
                               syncedAtMs: Option[Long])

  /** Build a runner straight from a config file — the one-line entrypoint:
    * `MirrorRunner.load(spark, "/path/mirror.yaml").start(60000)`.
    */
  def load(spark: SparkSession, configPath: String,
           connectionProps: java.util.Properties = new java.util.Properties()): MirrorRunner =
    new MirrorRunner(spark, MirrorConfig.load(spark, configPath), connectionProps)
}
