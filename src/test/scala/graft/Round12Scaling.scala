package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): scaling curves for the round-11/12 operators —
  * cross-corpus dedup over the salted 10×/100× document fixtures and
  * audio dedup over per-doc synthesized WAV clips (clip count = doc
  * count, so the decode+fingerprint kernel is measured at 5k/50k/500k
  * clips). `Test/runMain graft.Round12Scaling [dirs...]`; defaults to
  * sf0.1 + /tmp/graft_sf10x + /tmp/graft_sf100x.
  */
object Round12Scaling {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf10x", "/tmp/graft_sf100x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val passesX = (1 to 3).map { _ =>
        time {
          graft.ops.Dedup.crossCorpusDedup(
            docs.filter(col("doc_id") % 3 =!= 0), docs.filter(col("doc_id") % 3 === 0),
            threshold = 0.7, numHashes = 8, rowsPerBand = 2, shingleSize = 3,
            hotRefCap = 64)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val passesA = (1 to 3).map { _ =>
        time {
          val clips = docs.select(col("doc_id")).as[Long]
            .map(id => (id, SparkEntry.synthWav(id % 25)))
            .toDF("doc_id", "media")
          graft.ops.Multimodal.audioDedup(clips, "doc_id")
            .write.format("noop").mode("overwrite").save()
        }
      }
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nv = emb.count()
      val passesS = (1 to 3).map { _ =>
        time {
          graft.ops.Dedup.crossCorpusNearDupEmbedding(
            emb.filter(col("vec_id") % 3 =!= 0), emb.filter(col("vec_id") % 3 === 0),
            dims = 64, bits = 8, threshold = 0.3, hotRefCap = 64, rotations = 2)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"[r12scale] $dir docs=$n cross_dedup cold=${passesX.head}%.2f min=${passesX.min}%.2f  audio_dedup cold=${passesA.head}%.2f min=${passesA.min}%.2f  cross_sem vecs=$nv cold=${passesS.head}%.2f min=${passesS.min}%.2f")
    }
    spark.stop()
  }
}
