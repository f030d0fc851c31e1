package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not part of the driver contract): current use — does
  * dropDuplicates after repartitionByRange reuse the range exchange, and
  * what file-level min/max stats does the sorted layout give?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = (0L until 100000L).map(i => (i % 60000, s"content $i")).toDF("doc_id", "content")

    println("=== A: repartitionByRange -> dropDuplicates ===")
    docs.repartitionByRange(col("doc_id")).dropDuplicates("doc_id")
      .sortWithinPartitions("doc_id")
      .explain("formatted")

    println("=== B: dropDuplicates only (baseline) ===")
    docs.dropDuplicates("doc_id").explain("formatted")

    // write and probe: does a doc_id range filter skip files?
    val tmp = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    docs.repartitionByRange(8, col("doc_id")).dropDuplicates("doc_id")
      .sortWithinPartitions("doc_id").write.parquet(s"$tmp/sorted")
    val back = spark.read.parquet(s"$tmp/sorted").filter(col("doc_id") === 1234L)
    println("probe rows: " + back.count())
    spark.stop()
  }
}
