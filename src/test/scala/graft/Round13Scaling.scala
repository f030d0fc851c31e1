package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): NEAR-DUP RECALL vs corpus growth for the
  * hyperplane-LSH dedup paths — the measurement the fixed-`bits` design
  * could not show (r12 verdict: at 1000× every (band, bucket) saturates
  * `hotRefCap`, so each new vector verifies against the same capped
  * representative set — a silent recall floor).
  *
  * Method: plant exact-copy probes (one per ~n/200 ref vectors, re-id'd
  * out of the id space), so ground truth is KNOWN — every probe has a
  * cosine-1.0 partner in the corpus. Recall = flagged / planted, measured
  * for fixed bits=8 vs auto bits (log2(N/cap)) at 1×/10×/100× the sf0.1
  * embeddings, for both [[graft.ops.Dedup.crossCorpusNearDupEmbedding]]
  * (probe-vs-ref) and [[graft.ops.Dedup.embeddingNearDupLsh]]
  * (within-corpus). Saturation telemetry rides along via Observation.
  *
  * `Test/runMain graft.Round13Scaling [dirs...]`; defaults to sf0.1 +
  * /tmp/graft_sf10x + /tmp/graft_sf100x (built by [[ScalingFixture]]).
  */
object Round13Scaling {
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
    // re-run one section without paying for the others:
    // SPARK_GRAFT_SCALING_SECTIONS=media,bloom,recall (default all)
    val sections = sys.env.getOrElse("SPARK_GRAFT_SCALING_SECTIONS", "media,bloom,recall")
      .split(",").map(_.trim).toSet

    for (dir <- dirs) {
      // media e2e path at document scale: every doc an img ref, every %3
      // doc an audio ref (the q_media_e2e shape without the <100 fetch
      // budget) — fetch-synthesize, tag-routed fingerprint, dedup
      import spark.implicits._
      val docsN = spark.read.parquet(s"$dir/documents.parquet").count()
      val mediaPasses = if (!sections("media")) Seq(0.0) else (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ids = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id")).as[Long]
        val fetched = ids.flatMap { d =>
          val img = Iterator((d * 4, "img", SparkEntry.synthPng(d % 25)))
          val aud = if (d % 3 == 0) Iterator((d * 4 + 1, "audio", SparkEntry.synthWav(d % 25)))
                    else Iterator.empty
          img ++ aud
        }.toDF("asset_id", "tag", "media")
        graft.ops.Multimodal.mediaDedup(fetched, "asset_id")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (sections("media"))
        println(f"[r13media] $dir docs=$docsN media_e2e cold=${mediaPasses.head}%.1f min=${mediaPasses.min}%.1f")

      // Bloom-prefiltered cross-corpus exact dedup at document scale: ref =
      // the dir's documents; new dump = same ids re-keyed, 1-in-37 kept
      // verbatim (planted exact dups), the rest word-salted (never dups).
      // Measures filter build (one treeAggregate), probe+verify wall time,
      // and the candidate width the bloom lets through vs n_probed.
      if (sections("bloom")) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val tb0 = System.nanoTime()
        val bf = graft.ops.Dedup.buildFingerprintBloom(docs,
          expectedItems = math.max(1024L, docsN), fpp = 0.01)
        val buildS = (System.nanoTime() - tb0) / 1e9
        val newDump = docs.select((col("doc_id") + 700000000000L).as("doc_id"),
          when(col("doc_id") % 37 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" zq"), col("doc_id"))).as("text"))
        val passes = (1 to 2).map { i =>
          val obs = org.apache.spark.sql.Observation(s"bloom_${dir.hashCode}_$i")
          val t0 = System.nanoTime()
          val dups = graft.ops.Dedup.crossCorpusExactDedupBloom(
            newDump, docs, bf, saturation = Some(obs))
            .filter(col("exact_dup")).count()
          ((System.nanoTime() - t0) / 1e9, dups, obs.get)
        }
        val (dt, dups, m) = passes.minBy(_._1)
        println(f"[r13bloom] $dir docs=$docsN filter_kb=${bf.length / 1024} " +
          f"build=${buildS}%.1fs probe_verify=${dt}%.1fs dups=$dups " +
          f"candidates=${m("n_candidates")}/${m("n_probed")}")
      }

      // classifier training at document scale: 2 full-batch GD iterations
      // over the hashed features (label = a content marker so gradients are
      // non-trivial), then one scoring pass. Cost should be linear in docs:
      // per iteration = two bounded shuffles over the feature table.
      if (sections("clf")) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val isPos = col("text").contains("filter")
        val t0 = System.nanoTime()
        val wts = graft.ops.TextAnalysis.trainQualityClassifier(docs, isPos,
          buckets = 1024, iters = 2, lr = 200.0)
        val trainS = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.ops.TextAnalysis.scoreQualityClassifier(docs, wts)
          .write.format("noop").mode("overwrite").save()
        val scoreS = (System.nanoTime() - t1) / 1e9
        println(f"[r13clf] $dir docs=$docsN train2=${trainS}%.1fs score=${scoreS}%.1fs " +
          f"weights=${wts.count()}")
      }

      if (!sections("recall")) {
        // skip the recall section entirely for this dir
      } else {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      val stride = math.max(1L, n / 200L)
      val probes = emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
        .select((col("vec_id") + 900000000000L).as("vec_id"), col("embedding"))
      val nProbes = probes.count()

      for ((bits, rot, name) <- Seq((8, 1, "fixed8"), (0, 1, "auto"),
                                    (0, 2, "auto_r2"), (0, 4, "auto_r4"))) {
        // cross-corpus: probe-vs-ref, the recurring-dump shape
        val obs = org.apache.spark.sql.Observation(s"sat_${dir.hashCode}_$name")
        val t0 = System.nanoTime()
        val flagged = graft.ops.Dedup.crossCorpusNearDupEmbedding(
          probes, emb, dims = 64, bits = bits, threshold = 0.999,
          hotRefCap = 64, rotations = rot, saturation = Some(obs))
          .filter(col("dup")).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val sat = obs.get
        // within-corpus: corpus + planted copies, pair recall
        val t1 = System.nanoTime()
        val planted = emb.unionByName(probes)
        val pairs = graft.ops.Dedup.embeddingNearDupLsh(planted, dims = 64,
          bits = bits, threshold = 0.999, hotBucketCap = 64, rotations = rot)
        val found = pairs.filter(col("id_b") >= 900000000000L || col("id_a") >= 900000000000L)
          .select(when(col("id_a") >= 900000000000L, col("id_a")).otherwise(col("id_b")).as("p"))
          .distinct().count()
        val dt1 = (System.nanoTime() - t1) / 1e9
        println(f"[r13recall] $dir n=$n probes=$nProbes bits=$name " +
          f"cross_recall=${flagged.toDouble / nProbes}%.3f (${dt}%.1fs, " +
          f"sat_buckets=${sat("saturated_buckets")} dropped_refs=${sat("dropped_refs")}) " +
          f"within_recall=${found.toDouble / nProbes}%.3f (${dt1}%.1fs)")
      }
      }
    }
    spark.stop()
  }
}
