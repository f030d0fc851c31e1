package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): round-16 scaling measurements.
  *
  * Sections (`SPARK_GRAFT_SCALING_SECTIONS=hnswdefaults,keepbest`,
  * default all):
  *
  *  - **hnswdefaults** — recall AT THE SHIPPED DEFAULTS (the r15
  *    verdict's one weak grade): 2M clustered vectors queried through
  *    [[graft.ops.Hnsw.hnswTopK]] with shards = 0 (autoShards) and
  *    ef = 32 (the SearchMode.Hnsw default) — exercising BOTH r16
  *    fixes: TargetRowsPerShard lowered into the measured ≥0.9 band
  *    (32k) and the population-scaled beam floor
  *    ([[graft.ops.Hnsw.effectiveEf]]).
  *
  *  - **keepbest** — decade curve for the cross-corpus keep-best chain
  *    (q_ingest_keep_best / q_cross_dedup_keep_best were the two newest
  *    top-5 bench inhabitants in r15): planted near-dup corpora at
  *    1×/10×/100×, confirming the capped-banding asymmetry holds with
  *    scores attached (time growth tracks corpus growth, not pairs).
  */
object Round16Scaling {
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
      "hnswdefaults,keepbest").split(",").map(_.trim).toSet

    if (sections("hnswdefaults")) {
      val n = sys.env.getOrElse("SPARK_GRAFT_HNSW_N", "2000000").toLong
      val dims = 64
      // same clustered synthetic regime as the r14/r15 hnsw sections
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
      val autoN = graft.ops.Hnsw.autoShards(emb)
      println(s"[r16hnswdefaults] autoShards($n) = $autoN " +
        s"(target ${graft.ops.Hnsw.TargetRowsPerShard}/shard => ~${n / autoN}/shard, " +
        s"efFloor=${graft.ops.Hnsw.effectiveEf(32, 10, (n / autoN).toInt)})")
      for (ef <- sys.env.getOrElse("SPARK_GRAFT_HNSW_EF", "32").split(",").map(_.trim.toInt).toSeq) {
        val t0 = System.nanoTime()
        val got = graft.ops.Hnsw.hnswTopK(emb, probes, dims = dims, k = 10,
          m = 8, efConstruction = 48, ef = ef, shards = 0)
          .select("qid", "vec_id").as[(Long, Long)].collect().toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val recall = (got & truth).size.toDouble / truth.size
        println(f"[r16hnswdefaults] n=$n shards=auto($autoN) ef=$ef " +
          f"probes=$nProbes time=$dt%.1fs perVecUs=${dt * 1e6 / n}%.1f recall=$recall%.3f")
      }
      graft.core.Checkpoints.release(emb)
    }

    if (sections("keepbest")) {
      // planted-near-dup regime matching the r13 LSH scaling fixture:
      // `ref` is a clean reference corpus; `cand` carries 1 planted
      // near-dup per ~20 docs plus unique filler; keep-best must score
      // both sides and keep the argmax.
      for (nCand <- Seq(20000L, 200000L, 2000000L)) {
        val nRef = nCand / 10
        val mkText = (idc: org.apache.spark.sql.Column, salt: String) =>
          concat_ws(" ", (0 until 40).map(i =>
            concat(lit(s"tok$salt"), pmod(idc * (i * 2 + 3) + i, lit(9973)))): _*)
        val ref = spark.range(nRef).select(
          col("id").as("doc_id"),
          mkText(col("id"), "").as("text"),
          (col("id") % 100 + 50).cast("double").as("score"))
          .localCheckpoint(true)
        // every 20th candidate is an exact copy of ref doc (id/20 mod
        // nRef) — same token stream, so both the exact-fp layer and the
        // LSH layer see it; the rest are unique filler
        val cand = spark.range(nCand).select(
          (col("id") + 100000000L).as("doc_id"),
          when(col("id") % 20 === 0,
            mkText(floor(col("id") / 20).cast("long") % nRef, ""))
            .otherwise(mkText(col("id") + 7919L, "u")).as("text"),
          (col("id") % 200).cast("double").as("score"))
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val acts = graft.ops.Dedup.crossCorpusDedupKeepBest(
            cand, ref, "score", threshold = 0.8)
          .groupBy("action").count().as[(String, Long)].collect().toMap
        val dtDecide = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val members = graft.ops.Dedup.ingestKeepBest(
            cand, ref, "score", threshold = 0.8)
          .groupBy("src").count().as[(String, Long)].collect().toMap
        val dtIngest = (System.nanoTime() - t1) / 1e9
        println(f"[r16keepbest] nRef=$nRef nCand=$nCand decide=$dtDecide%.1fs " +
          f"ingest=$dtIngest%.1fs " +
          s"actions=${acts.toSeq.sortBy(_._1).map { case (a, c) => s"$a=$c" }.mkString(",")} " +
          s"members=${members.toSeq.sortBy(_._1).map { case (a, c) => s"$a=$c" }.mkString(",")}")
        graft.core.Checkpoints.release(ref); graft.core.Checkpoints.release(cand)
      }
    }

    spark.stop()
  }
}
