package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.SimilaritySearch

/** Dev tool (test scope, not part of the driver contract): measure
  * recall@10 and per-probe candidate volume for IVF search across corpus
  * growth — `Test/runMain graft.RecallScaling [dir ...]` (defaults: the
  * sf0.1 embeddings and the 100× [[ScalingFixture]] output). This is the
  * measurement behind SCALING.md's recall table and the rationale for
  * [[SimilaritySearch.autoCells]]:
  *
  *  - a FIXED nCells (the gates' deterministic nCells=16) keeps recall as
  *    the corpus grows only because each cell gets fatter — the per-probe
  *    candidate volume grows linearly with N (at 100× the "index" rereads
  *    a quarter of the corpus per probe);
  *  - autoCells (≈ √N, the FAISS heuristic) keeps per-probe candidates at
  *    O(√N); holding the probed FRACTION (nProbe/nCells) roughly constant
  *    recovers the recall floor while still reading ~√N fewer rows than
  *    the fixed layout.
  *
  * Exact top-10 ([[SimilaritySearch.bruteForceTopK]]) is the ground truth;
  * probes are the 20 surviving replica-0 vectors, identical across
  * fixtures by construction.
  */
object RecallScaling {

  /** Seeded Gaussian-cluster corpus (the AnnRecallSpec fixture scaled up):
    * 64 fixed centers, `n` points — the geometry IVF is built for, vs the
    * near-random testdata embeddings where any ANN's recall is bounded by
    * the scanned fraction.
    */
  private def clustered(spark: SparkSession, n: Int, dims: Int = 32) = {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val centers = Array.fill(64)(Array.fill(dims)(rnd.nextGaussian().toFloat * 2f))
    (0L until n.toLong).map { i =>
      val c = centers(rnd.nextInt(centers.length))
      (i, Seq.tabulate(dims)(j => c(j) + rnd.nextGaussian().toFloat * 0.4f))
    }.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf100",
        "clustered:2000", "clustered:200000")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-recall-scaling").getOrCreate()
    try {
      for (dir <- dirs) {
        val emb = (if (dir.startsWith("clustered:"))
          clustered(spark, dir.stripPrefix("clustered:").toInt)
        else spark.read.parquet(s"$dir/embeddings.parquet"))
          .select("vec_id", "embedding").persist()
        val n = emb.count()
        val probes = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val probeRows = probes.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        val k = 10
        val exact = SimilaritySearch.bruteForceTopK(emb, probes, k = k)
          .select("qid", "vec_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

        // (layout, nCells requested, nProbe); nCells=0 → autoCells(√N)
        val runs = Seq(("fixed", 16, 4), ("auto", 0, 4), ("auto", 0, 16))
        for ((tag, ncReq, nProbe) <- runs) {
          val (assigned, centroids) =
            SimilaritySearch.ivfAssign(emb, nCells = ncReq, lloydIters = 1)
          val a = assigned.persist()
          val nc = centroids.count()
          val ann = SimilaritySearch.ivfTopK(a, centroids, probes, k = k, nProbe = nProbe)
            .select("qid", "vec_id").collect()
            .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
          val recall = probeRows.map { case (q, _) =>
            val e = exact(q)
            (ann.getOrElse(q, Set.empty) & e).size.toDouble / e.size
          }.sum / probeRows.length
          // per-probe candidate volume = sum of probed-cell sizes
          val sizes = a.groupBy("cell").count().collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val (cvs, cids) = SimilaritySearch.collectCentroids(centroids)
          val avgCand = probeRows.map { case (_, qv) =>
            SimilaritySearch.nearestCellsLocal(qv, cvs, cids, nProbe)
              .map(c => sizes.getOrElse(c, 0L)).sum
          }.sum.toDouble / probeRows.length
          a.unpersist()
          println(f"[recall] dir=$dir n=$n layout=$tag nCells=$nc nProbe=$nProbe " +
            f"recall@$k=$recall%.3f candRowsPerProbe=$avgCand%.0f " +
            f"fracScanned=${avgCand / n}%.4f")
        }
        emb.unpersist()
      }
    } finally spark.stop()
  }
}
