package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not part of the driver contract): current use — where does
  * q_pack_sequences spend its time at sf0.1 (dup-id check vs two-level
  * prefix machinery)?
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
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("[scratch] n_docs=" + docs.count())
    import graft.functions.textkernel.token_stats
    val sized = docs.select(lit("").as("__gk"), col("doc_id").cast("long").as("doc_id"),
      token_stats(col("text")).getField("n_tokens_naive").as("n_tokens"))
    for (pass <- 1 to 3) {
      time("bounds min/max only") {
        sized.agg(min("doc_id"), max("doc_id")).head()
      }
      time("bounds + dup check") {
        sized.agg(min("doc_id"), max("doc_id"), count(lit(1)),
          countDistinct(struct(col("__gk"), col("doc_id")))).head()
      }
      time("packSequences full") {
        ops.TextAnalysis.packSequences(docs, tokenBudget = 512, targetGroups = 64)
          .write.format("noop").mode("overwrite").save()
      }
      time("mixtureOrder gate-shaped") {
        ops.TextAnalysis.mixtureOrder(docs, Map("en" -> 2.0, "de" -> 0.5),
            groupCol = "lang", targetGroups = 64)
          .orderBy(col("pos").asc, col("lang").asc, col("doc_id").asc)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
