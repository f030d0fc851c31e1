package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): round-15 scaling measurements.
  *
  * Sections (`SPARK_GRAFT_SCALING_SECTIONS=hnswshards,bigram,mp3,mpeg1`,
  * default all):
  *
  *  - **hnswshards** — the shard-population knee behind
  *    [[graft.ops.Hnsw.autoShards]]: at a FIXED 2M-vector corpus, vary
  *    the shard count (8 / 32 / 128 → 250k / 62.5k / 15.6k vectors per
  *    shard) and measure build+search wall time, per-vector µs and
  *    recall@10. The per-shard build is O(n_shard · ef_c · log n_shard),
  *    so cost per vector should RISE with shard population — the knee
  *    auto-sizing caps by never letting a shard exceed
  *    [[graft.ops.Hnsw.TargetRowsPerShard]] (256k).
  *
  *  - **bigram** — the r15 pre-aggregation in
  *    [[graft.ops.FullText.bigramSurprisalRaw]]: measure the LM-join
  *    input reduction (bigram occurrence rows vs distinct (doc, w1, w2)
  *    rows — the factor the count-table join no longer amplifies by) and
  *    surprisalBuckets wall time across corpus decades.
  *
  *  - **mp3** / **mpeg1** — [[graft.ops.Mp3Codec]] /
  *    [[graft.ops.Mpeg1Codec]] decode throughput across decades of asset
  *    count (full fixture streams: Huffman + requant + alias + IMDCT per
  *    granule, VLC + IDCT per block): per-asset µs must stay flat —
  *    decode is in-partition, only the small stats row shuffles.
  */
object Round15Scaling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sections = sys.env.getOrElse("SPARK_GRAFT_SCALING_SECTIONS",
      "hnswshards,bigram,mp3,mpeg1").split(",").map(_.trim).toSet

    if (sections("hnswshards")) {
      val n = 2000000L
      val dims = 64
      // same clustered synthetic regime as the r14 hnsw section
      val emb = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), d =>
          (sin(pmod(col("id"), lit(32)) * 31 + d * 7) +
            cos(col("id") * 13 + d) * 0.05).cast("float")).as("embedding"))
        .localCheckpoint(true)
      val probes = emb.filter(col("vec_id") % 100000L === 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val nProbes = probes.count()
      val truth = graft.ops.SimilaritySearch.bruteForceTopK(emb, probes, k = 10)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      for (shards <- sys.env.getOrElse("SPARK_GRAFT_HNSW_SHARDS", "8,32,128").split(",").map(_.trim.toInt).toSeq) {
        val t0 = System.nanoTime()
        val got = graft.ops.Hnsw.hnswTopK(emb, probes, dims = dims, k = 10,
          m = 8, efConstruction = 48, ef = 64, shards = shards)
          .select("qid", "vec_id").as[(Long, Long)].collect().toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val recall = (got & truth).size.toDouble / truth.size
        println(f"[r15hnswshards] n=$n shards=$shards perShard=${n / shards} " +
          f"probes=$nProbes time=$dt%.1fs perVecUs=${dt * 1e6 / n}%.1f recall=$recall%.3f")
      }
      println(s"[r15hnswshards] autoShards(2M corpus) = ${graft.ops.Hnsw.autoShards(emb)} " +
        s"(target ${graft.ops.Hnsw.TargetRowsPerShard}/shard, parallelism ${spark.sparkContext.defaultParallelism})")
      graft.core.Checkpoints.release(emb)
    }

    if (sections("bigram")) {
      // natural-language repetition profile: function-word bigrams ("of
      // the", "in the") recur MANY times within one document — the
      // within-doc multiplicity the (doc, w1, w2, k) pre-aggregation
      // collapses before the count-table join. (The sf corpus is
      // synthetic low-repetition text: measured reduction there is only
      // ~1.04×; this fixture carries a realistic ~8 repeats/doc.)
      for (nDocs <- Seq(5000L, 50000L, 500000L)) {
        val phrase = Seq.fill(8)("of the story in the end of a day").mkString(" ")
        val docs = spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ",
            lit(phrase),
            concat(lit("w"), col("id") % 977), concat(lit("x"), col("id") % 659),
            concat(lit("y"), col("id") % 431)).as("text"),
          (col("id") % 3).cast("string").as("lang"))
        import graft.functions.textkernel
        val toks = docs.select(col("doc_id"), textkernel.word_tokens(col("text")).as("w"))
        val occ = toks.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) as w1, element_at(w, i + 1) as w2))")).as("p"))
        val occurrences = occ.count()
        val distinctTriples = occ.select(col("doc_id"), col("p.w1"), col("p.w2"))
          .distinct().count()
        val t0 = System.nanoTime()
        graft.ops.FullText.surprisalBuckets(docs).agg(sum("bucket")).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r15bigram] docs=$nDocs occRows=$occurrences joinRows=$distinctTriples " +
          f"reduction=${occurrences.toDouble / distinctTriples}%.2fx bucketsTime=$dt%.1fs")
      }
    }

    if (sections("mp3")) {
      for (nAssets <- Seq(1000L, 10000L, 100000L)) {
        val media = spark.range(nAssets).select(col("id").as("doc_id")).as[Long]
          .map(id => (id, SparkEntry.synthMp3L3(id)))
          .toDF("doc_id", "media")
        val t0 = System.nanoTime()
        val rows = graft.ops.Multimodal.mp3SpectralFingerprintDF(media, "doc_id").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r15mp3] assets=$nAssets decoded=$rows time=$dt%.1fs " +
          f"perAssetUs=${dt * 1e6 / nAssets}%.1f")
      }
    }

    if (sections("mpeg1")) {
      for (nAssets <- Seq(1000L, 10000L, 100000L)) {
        val media = spark.range(nAssets).select(col("id").as("doc_id")).as[Long]
          .map(id => (id, SparkEntry.synthMpeg1(id)))
          .toDF("doc_id", "media")
        val t0 = System.nanoTime()
        val rows = graft.ops.Multimodal.videoFrameStats(media, "doc_id").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r15mpeg1] assets=$nAssets frameRows=$rows time=$dt%.1fs " +
          f"perAssetUs=${dt * 1e6 / nAssets}%.1f")
      }
    }

    // inter-frame decode throughput: the B fixture runs the FULL motion
    // pipeline per asset (forward + backward + interpolated MC, skipped
    // repetition, reordering) — per-asset cost must stay flat like the
    // intra path
    if (sections("mpeg1b")) {
      for (nAssets <- Seq(1000L, 10000L, 100000L)) {
        val media = spark.range(nAssets).select(col("id").as("doc_id")).as[Long]
          .map(id => (id, SparkEntry.synthMpeg1B(id)))
          .toDF("doc_id", "media")
        val t0 = System.nanoTime()
        val rows = graft.ops.Multimodal.videoFrameStats(media, "doc_id").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r15mpeg1b] assets=$nAssets frameRows=$rows time=$dt%.1fs " +
          f"perAssetUs=${dt * 1e6 / nAssets}%.1f")
      }
    }

    // PDF extraction throughput: object scan + COS parse + inflate +
    // operator walk per document — partition-local like the media codecs
    if (sections("pdf")) {
      for (nAssets <- Seq(1000L, 10000L, 100000L)) {
        val media = spark.range(nAssets).select(col("id").as("doc_id")).as[Long]
          .map(id => (id, SparkEntry.synthPdf(id)))
          .toDF("doc_id", "media")
        val t0 = System.nanoTime()
        val rows = graft.sources.PdfCodec.pdfTextDF(media, "doc_id").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r15pdf] assets=$nAssets parsed=$rows time=$dt%.1fs " +
          f"perAssetUs=${dt * 1e6 / nAssets}%.1f")
      }
    }

    // short-block decode throughput: reorder + 3×12-point IMDCTs per
    // short granule vs the long path's single 36-point
    if (sections("mp3short")) {
      for (nAssets <- Seq(1000L, 10000L, 100000L)) {
        val media = spark.range(nAssets).select(col("id").as("doc_id")).as[Long]
          .map(id => (id, SparkEntry.synthMp3Short(id)))
          .toDF("doc_id", "media")
        val t0 = System.nanoTime()
        val rows = graft.ops.Multimodal.mp3WeightedSpectralFingerprintDF(media, "doc_id").count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r15mp3short] assets=$nAssets decoded=$rows time=$dt%.1fs " +
          f"perAssetUs=${dt * 1e6 / nAssets}%.1f")
      }
    }

    spark.stop()
  }
}
