package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake layout management: time-partitioned fact tables so date filters
  * become partition pruning (directories skipped at planning time, before a
  * single byte is read). At 100 TB this is the difference between scanning
  * one month and scanning the lake — the declarative counterpart to
  * ClickHouse's PARTITION BY toYYYYMM(date) on the replicated target.
  */
object Layout {

  /** Write `df` partitioned by month of `tsCol` (adds `part_month` =
    * 'yyyy-MM' directory key).
    */
  def writeMonthly(df: DataFrame, tsCol: String, targetDir: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode(SaveMode.Overwrite).partitionBy("part_month").parquet(targetDir)

  /** Read the monthly layout; month-range predicates on `part_month` prune
    * at the directory level.
    */
  def readMonthly(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir)

  /** Write `df` as a bucketed parquet table: rows are hash-clustered into
    * `numBuckets` files per partition by `bucketCol` and sorted inside each
    * bucket. Two tables bucketed the same way on their join key co-locate:
    * a join between them needs NO shuffle (and with the sort, no re-sort) —
    * at 100 TB this turns every fact×fact join on the bucket key from a
    * full-network exchange into a local merge. The bucket metadata lives in
    * the session catalog, so readers must come through [[readTable]].
    *
    * The table is external (data at `path`), `Overwrite` replaces both data
    * and catalog entry.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a catalog table (bucketed writes must be read this way — a plain
    * `read.parquet` on the files would discard the bucket spec and
    * reintroduce the shuffle).
    */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Z-ordered (Morton-curve) layout: cluster rows so that range filters on
    * ANY of `zCols` skip most files via parquet min/max stats — the
    * multi-column generalization of single-key clustering (ClickHouse's
    * `ORDER BY (a, b)` tuple on the replicated target; a plain sort clusters
    * only its leading column). Each column is quantile-bucketed into
    * 2^`bitsPerCol` ranks whose bits interleave into one z-value; range
    * partitioning + an in-partition sort on it give every file a tight
    * min/max envelope in EVERY z-dimension.
    *
    * Scale: the quantile sketch is the only driver-side piece (bounded:
    * `buckets − 1` doubles per column at fixed relative error); bucketing
    * and bit interleaving are pure columnar expressions, and the one range
    * exchange replaces the shuffle a consumer would otherwise pay on every
    * filtered scan.
    */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], targetDir: String,
                    numFiles: Int, bitsPerCol: Int = 8): Unit = {
    require(zCols.nonEmpty && bitsPerCol >= 1 && bitsPerCol <= 16,
      s"zCols=$zCols bitsPerCol=$bitsPerCol out of range")
    val buckets = 1 << bitsPerCol
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds: Map[String, Array[Double]] =
      zCols.map(c => c -> df.stat.approxQuantile(c, probs, 0.001).distinct).toMap

    // rank = #boundaries <= value: a columnar fold over the literal
    // boundary array (nulls fold to rank 0 and cluster together). A
    // low-cardinality column yields few distinct boundaries; stretch its
    // rank over the full bit range, else its high bits are constant zero
    // and the curve degenerates to a sort on the other columns.
    def rankOf(c: String): Column = {
      val d = math.max(bounds(c).length, 1)
      val raw = aggregate(lit(bounds(c)), lit(0L),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
      floor(raw * lit((buckets - 1).toLong) / lit(d.toLong)).cast("long")
    }

    // Morton interleave: bit i of column j lands at position i*nCols + j
    val n = zCols.size
    val z = zCols.zipWithIndex.map { case (c, j) =>
      val r = rankOf(c)
      (0 until bitsPerCol).map { i =>
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce[Column](_.bitwiseOR(_))
    }.reduce[Column](_.bitwiseOR(_))

    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(targetDir)
  }

  /** Build a FILE-SKIPPING stats manifest over a parquet layout: one row
    * per data file with each tracked column's min/max (the Delta/Iceberg
    * per-file stats idea as a plain sidecar). Parquet already prunes row
    * groups from footers, but only AFTER listing and opening every file;
    * on a 100 TB table the listing + footer reads ARE the latency. This
    * manifest lets [[readSkipping]] prune to the surviving file list
    * DRIVER-SIDE from one tiny parquet read, so a clustered layout
    * ([[writeZOrdered]], [[writeMonthly]], a sorted mirror) serves a
    * narrow range scan by opening only the files whose envelope
    * intersects it.
    *
    * One corpus pass builds it (per-file min/max via a (file) grouped
    * aggregation — map-side combined, manifest size = files × cols, tiny);
    * rebuild after rewriting the layout. Committed via tmp + rename so a
    * torn build never serves half a manifest. The full layout's schema —
    * partition-column types included — is pinned alongside the stats
    * (`_schema.json`, invisible to parquet listing), so a later
    * [[readSkipping]] never re-infers partition types from whatever
    * directory subset happened to survive the prune.
    */
  def writeStatsManifest(spark: SparkSession, dir: String,
                         cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "need at least one tracked column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val corpus = spark.read.parquet(dir)
    val manifest = corpus
      .withColumn("__file", input_file_name())
      .groupBy(col("__file").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val tmp = s"$dir/_graft_stats_tmp"
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // schema sidecar joins the tmp dir BEFORE the rename: the commit stays
    // a single atomic swap
    val sOut = fs.create(new org.apache.hadoop.fs.Path(tmp, "_schema.json"), true)
    try sOut.write(corpus.schema.json.getBytes("UTF-8")) finally sOut.close()
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_stats")
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }

  /** Range scan through the manifest: keep only files whose [min, max]
    * envelope intersects `[lo, hi]` on `rangeCol` (files with a null
    * envelope — all-null or untracked values — are conservatively kept),
    * then apply the residual predicate exactly. Returns precisely
    * `full scan WHERE rangeCol BETWEEN lo AND hi`; only the IO differs.
    * The manifest read is one tiny parquet file; the surviving list is
    * O(matching files) driver-side — the same order of driver work any
    * planner spends on partition pruning.
    *
    * The surviving files are read with `basePath = dir`, so on a
    * hive-partitioned layout ([[writeMonthly]]) the partition columns are
    * recovered from the directory names exactly as a full `read.parquet
    * (dir)` would — including when `rangeCol` IS the partition column;
    * their TYPES come from the manifest's pinned schema, not re-inferred
    * from the surviving subset (a manifest predating the sidecar falls
    * back to inference). Manifest file paths are `input_file_name()` URIs
    * (URL-encoded): they are decoded before the read so layouts with
    * encodable characters (spaces, `%`, `#`) in path segments resolve,
    * and then GLOB-ESCAPED, because `spark.read.parquet` pattern-expands
    * its path arguments — a literal `[`/`*`/`{` in a decoded segment
    * would otherwise match the wrong files (or nothing) instead of
    * itself.
    */
  def readSkipping(spark: SparkSession, dir: String, rangeCol: String,
                   lo: Any, hi: Any): DataFrame = {
    val m = spark.read.parquet(s"$dir/_graft_stats")
    val keep = m.where(
      col(s"min_$rangeCol").isNull || col(s"max_$rangeCol").isNull ||
        (col(s"min_$rangeCol") <= lit(hi) && col(s"max_$rangeCol") >= lit(lo)))
      .select(col("file")).collect()
      .map { r =>
        val decoded =
          new org.apache.hadoop.fs.Path(new java.net.URI(r.getString(0))).toString
        decoded.replaceAll("([\\\\*?\\[\\]{}])", "\\\\$1")
      }
    val schemaPath = new org.apache.hadoop.fs.Path(s"$dir/_graft_stats/_schema.json")
    val fs = schemaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinned: Option[org.apache.spark.sql.types.StructType] =
      if (!fs.exists(schemaPath)) None
      else {
        val in = fs.open(schemaPath)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(org.apache.spark.sql.types.DataType.fromJson(txt)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      }
    val base =
      if (keep.isEmpty) pinned match {
        // empty relation with the layout's schema — no listing at all
        case Some(st) => spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), st)
        case None => spark.read.parquet(dir).where(lit(false))
      }
      else {
        val r = spark.read.option("basePath", dir)
        pinned.map(r.schema).getOrElse(r).parquet(keep: _*)
      }
    base.where(col(rangeCol).between(lit(lo), lit(hi)))
  }
}
