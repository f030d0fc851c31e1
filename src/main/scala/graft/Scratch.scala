package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val sig = graft.ops.Dedup.minhashSignature(docs, "text", 8, 3).filter(col("mh0").isNotNull)
    time("sig_materialize")(println("sig rows=" + sig.count()))
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"), md5(concat_ws("_", col(s"mh${2*b}"), col(s"mh${2*b+1}"))).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    time("buckets")(println("bucket rows=" + buckets.count()))
    val a = buckets.as("a"); val bb = buckets.as("b")
    val cand = a.join(bb, col("a.band")===col("b.band") && col("a.bucket")===col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
    time("candidates")(println("cand rows=" + cand.count()))
    time("distinct_cand")(println("dist=" + cand.select(col("a.doc_id"), col("b.doc_id")).distinct().count()))
    time("full_lsh")(println("pairs=" + graft.ops.Dedup.minhashLsh(docs, "text", 0.0, 8, 2, 3).count()))
    time("full_lsh2")(println("pairs=" + graft.ops.Dedup.minhashLsh(docs, "text", 0.0, 8, 2, 3).count()))
    spark.stop()
  }
}
