package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (sf <- Seq("sf0.01", "sf0.1"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("dedup_ngram_jaccard")(spark, s"/root/testdata/$sf").count()
      println(f"RESULT $sf run$i rows=$n time=${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
