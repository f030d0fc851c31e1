package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    for (i <- 1 to 3) run("q_ann_lsh")
    for (i <- 1 to 2) run("q_word_freq")
    spark.stop()
  }
}
