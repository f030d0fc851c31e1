package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not part of the driver contract): current use — phase
  * timing of q_dup_clusters at sf0.1 (pair generation vs cluster rounds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // warm
    emb.count()
    for (_ <- 1 to 3) {
      val pairs = ops.Dedup.embeddingNearDup(emb, threshold = 0.3)
      val cached = time("pairs materialize") { pairs.localCheckpoint(true) }
      println("[scratch] n_pairs=" + cached.count())
      time("dupClusters") {
        ops.Dedup.dupClusters(cached).write.format("noop").mode("overwrite").save()
      }
      time("full query") {
        ops.Dedup.dupClusters(ops.Dedup.embeddingNearDup(emb, threshold = 0.3))
          .orderBy("doc_id").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
