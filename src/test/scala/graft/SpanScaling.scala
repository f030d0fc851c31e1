package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): scaling curves for the r13 single-scan span
  * family — [[graft.ops.Dedup.spanDedup]] / [[graft.ops.Dedup.segmentDedup]]
  * (rewritten: window-marked keepers, kernel span removal) and
  * [[graft.ops.TextAnalysis.decontaminateSpans]] (broadcast-semi marking)
  * — over the salted 10×/100× document fixtures. The claim under test:
  * cost grows linearly with corpus size (the digest/window exchanges carry
  * 8-16 B rows; text crosses at most two doc-keyed exchanges), and the
  * decontamination variant stays corpus-shuffle-free as the corpus grows
  * while the eval side stays fixed.
  *
  * `Test/runMain graft.SpanScaling [dirs...]`; defaults to sf0.1 +
  * /tmp/graft_sf10x + /tmp/graft_sf100x (built by [[ScalingFixture]]).
  */
object SpanScaling {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf10x", "/tmp/graft_sf100x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val span = (1 to 3).map { _ => time {
        graft.ops.Dedup.spanDedup(docs, windowWords = 10)
          .write.format("noop").mode("overwrite").save()
      }}
      val seg = (1 to 3).map { _ => time {
        graft.ops.Dedup.segmentDedup(docs, segWords = 20)
          .write.format("noop").mode("overwrite").save()
      }}
      // eval side fixed at ~1k docs regardless of corpus size — the
      // benchmark doesn't grow with the crawl
      val evalSet = docs.filter(col("doc_id") % lit(math.max(1L, n / 1000L)) === 3)
        .select(col("text"))
      val dec = (1 to 3).map { _ => time {
        graft.ops.TextAnalysis.decontaminateSpans(docs, evalSet, windowWords = 10)
          .write.format("noop").mode("overwrite").save()
      }}
      println(f"[spanscale] $dir docs=$n span_dedup cold=${span.head}%.2f min=${span.min}%.2f  " +
        f"seg_dedup cold=${seg.head}%.2f min=${seg.min}%.2f  " +
        f"decontam_spans cold=${dec.head}%.2f min=${dec.min}%.2f")
    }
    spark.stop()
  }
}
