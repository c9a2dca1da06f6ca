package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic local scale-up generator — the measurement half of the
  * 100 TB design story: replicate an sf directory `factor`× with remapped
  * keys/ids, so the headline operator families can be benched at 1×/3×/10×
  * and their time-vs-size curves committed to `SCALING.md` instead of
  * argued from plan shape.
  *
  * Replication is NOT naive copying — naive copies would manufacture
  * super-linear blowups that say nothing about the operators:
  *  - every surrogate key/id shifts by `replica × (max(key)+1)` so joins,
  *    grouping cardinalities, and per-key row counts scale the way a
  *    bigger TPC-H scale factor scales them (more keys, same rows/key);
  *  - `nation`/`region` stay fixed: they are the broadcast dims, which do
  *    not grow with fact data in production either;
  *  - document TEXT is remapped per replica by a bijective token map
  *    (token → token + "·i"): within a replica every shingle/minhash/
  *    Jaccard relationship of the original corpus is preserved exactly
  *    (the map is injective on tokens), while CROSS-replica n-gram overlap
  *    drops to zero — otherwise each document would gain `factor` exact
  *    clones and pair-enumerating dedup output would grow quadratically
  *    by construction of the data, not by any property of the operator;
  *  - embeddings get a per-replica diagonal ±1 transform (deterministic
  *    sign flip of a dim subset): within a replica all norms and pairwise
  *    cosines are EXACTLY preserved (D·x · D·y = x·y), while cross-replica
  *    cosines decorrelate — same rationale as the token map;
  *  - `events.ts` keeps its time range (more events per hour, the shape a
  *    busier site produces), so watermark/window operators see constant
  *    range with denser data — their state keys grow with users, which DO
  *    scale.
  *
  * Determinism: everything derives from (replica index, column value) —
  * no RNG, no clock — so two runs produce byte-identical tables and the
  * bench curves are reproducible.
  *
  * Usage: `runMain graft.ScaleUp <inDir> <outDir> <factor>`.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inDir> <outDir> <factor>")
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, inDir, outDir, factor)
    spark.stop()
  }

  def generate(spark: SparkSession, inDir: String, outDir: String,
               factor: Int): Unit = {
    def in(t: String) = spark.read.parquet(s"$inDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // one stride per key space, from the 1× data: replica i's keys live in
    // [i·stride, (i+1)·stride) — disjoint ranges, FK relationships intact
    def strideOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).collect()(0).getLong(0) + 1L

    val (cust, supp, part, orders, lineitem, events, docs, embs) =
      (in("customer"), in("supplier"), in("part"), in("orders"),
        in("lineitem"), in("events"), in("documents"), in("embeddings"))
    val cS = strideOf(cust, "c_custkey")
    val sS = strideOf(supp, "s_suppkey")
    val pS = strideOf(part, "p_partkey")
    val oS = strideOf(orders, "o_orderkey")
    val eS = strideOf(events, "event_id")
    val uS = strideOf(events, "user_id")
    val dS = strideOf(docs, "doc_id")
    val vS = strideOf(embs, "vec_id")

    // key shift preserving the column's physical type (int keys stay int)
    def shift(c: String, stride: Long, i: Int) = (df: DataFrame) => {
      val t = df.schema(c).dataType
      df.withColumn(c, (col(c).cast("long") + lit(stride * i)).cast(t))
    }
    // bijective per-replica token map; replica 0 is the original corpus
    def remapTokens(c: String, i: Int) = (df: DataFrame) =>
      if (i == 0) df
      else df.withColumn(c, regexp_replace(col(c), "(\\S+)", "$1·" + i))
    // per-replica diagonal ±1: deterministic in (replica, dim) only, so
    // the same transform applies to every row of the replica
    def signFlip(c: String, i: Int) = (df: DataFrame) =>
      if (i == 0) df
      else df.withColumn(c, expr(
        s"transform($c, (x, j) -> IF(pmod(hash(j, $i), 2) = 0, x, -x))"))

    def replicate(base: DataFrame)(f: Int => DataFrame => DataFrame): DataFrame =
      (0 until factor).map(i => f(i)(base)).reduce(_ union _)

    // dims stay fixed: broadcast tables don't scale with fact data
    write("region", in("region"))
    write("nation", in("nation"))

    write("customer", replicate(cust)(i => shift("c_custkey", cS, i)))
    write("supplier", replicate(supp)(i => shift("s_suppkey", sS, i)))
    write("part", replicate(part)(i =>
      shift("p_partkey", pS, i).andThen(remapTokens("p_name", i))))
    write("orders", replicate(orders)(i =>
      shift("o_orderkey", oS, i).andThen(shift("o_custkey", cS, i))))
    write("lineitem", replicate(lineitem)(i =>
      shift("l_orderkey", oS, i).andThen(shift("l_partkey", pS, i))
        .andThen(shift("l_suppkey", sS, i))))
    write("events", replicate(events)(i =>
      shift("event_id", eS, i).andThen(shift("user_id", uS, i))))
    write("documents", replicate(docs)(i => (df: DataFrame) =>
      remapTokens("text", i)(shift("doc_id", dS, i)(df))
        .withColumn("n_chars", length(col("text")).cast("long"))))
    write("embeddings", replicate(embs)(i =>
      shift("vec_id", vS, i).andThen(signFlip("embedding", i))))
  }
}
