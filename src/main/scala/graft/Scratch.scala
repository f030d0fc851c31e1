package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilaritySearch

/** Dev harness (not part of the driver contract): current use — IVF
  * recall@5 vs brute force across lloydIters/nProbe on sf0.01 embeddings.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = SimilaritySearch.bruteForceTopK(emb, probes, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    println("labels: " + emb.select(countDistinct("label")).head().getLong(0) +
      " rows: " + emb.count())
    for ((nCells, lloyd, nProbe) <- Seq((16, 0, 4), (16, 2, 4), (16, 2, 8), (16, 3, 8), (16, 2, 9), (16, 3, 9))) {
      val (assigned, centroids) = SimilaritySearch.ivfAssign(emb, nCells = nCells, lloydIters = lloyd)
      val approx = SimilaritySearch.ivfTopK(assigned, centroids, probes, k = 5, nProbe = nProbe)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = exact.map { case (q, s) => (s intersect approx.getOrElse(q, Set.empty)).size / 5.0 }
        .sum / exact.size
      println(f"nCells=$nCells lloyd=$lloyd nProbe=$nProbe recall@5=${recall}%.3f")
    }
    spark.stop()
  }
}
