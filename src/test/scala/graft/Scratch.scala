package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val p = Tables.load(spark, s"/root/testdata/$sf", "part")
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_name"))
      // old semantic path (reference result)
      val lev = levenshtein(col("l.p_name"), col("r.p_name"), 3)
      val old = p.as("l").join(p.as("r"),
          col("l.p_brand") === col("r.p_brand") && col("l.p_type") === col("r.p_type")
            && col("l.p_partkey") < col("r.p_partkey"))
        .where(lev >= 0)
        .select(col("l.p_partkey").as("a"), col("r.p_partkey").as("b"), lev.cast("int").as("d"))
        .as[(Long, Long, Int)].collect().toSet
      val t0 = System.nanoTime()
      val neu = graft.operators.Fuzzy.editPairs(p, "p_partkey", "p_name", 3,
          Seq("p_brand", "p_type"))
        .as[(Long, Long, Int)].collect().toSet
      println(f"RESULT $sf: old=${old.size} new=${neu.size} diff=${(old -- neu).size}/${(neu -- old).size} newtime=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
