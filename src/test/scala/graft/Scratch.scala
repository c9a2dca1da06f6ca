package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = (1 << 20) + 100000
    val pairs = spark.range(0, n).select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
    val jobs = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val comp = graft.operators.Dedup.components(pairs)
    val bad = comp.where(col("comp") =!= col("id") - pmod(col("id"), lit(2))).count()
    spark.sparkContext.removeSparkListener(l)
    println(f"RESULT edges=$n rows=${comp.count()} bad=$bad jobs=${jobs.get()} time=${(System.nanoTime()-t0)/1e9}%.1f s persisted=${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
