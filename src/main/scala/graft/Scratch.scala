package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def ex(name: String): Unit = {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(3500))
    }
    ex("q_knn_cosine")
    ex("q_hydrate")
    ex("q_key_lookup")
    ex("q_dedup_first_per_key")
    spark.stop()
  }
}
