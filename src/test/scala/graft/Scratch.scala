package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not part of the driver contract): current use — timing
  * decontamination at the 1000× fixture with a FIXED-size eval set (the
  * real-world shape: the benchmark does not grow with the corpus), to pair
  * with the gate-shaped measurement in SCALING.md whose eval side scales
  * ×1000.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-scratch").getOrCreate()
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      // fixed eval: the unsalted replica-0 slice (≤ 5k docs at any fixture
      // size) — the broadcast side is CONSTANT as the corpus grows
      val eval = docs.filter(col("doc_id") < 10_000_000L && col("doc_id") % 7 === 3)
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.ops.TextAnalysis.decontaminate(docs, eval, n = 3)
          .agg(sum("n_hits"), count(lit(1))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] pass $pass: $sec%.2f s hits=${n.getLong(0)} docs=${n.getLong(1)}")
      }
    } finally spark.stop()
  }
}
