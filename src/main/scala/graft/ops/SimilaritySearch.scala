package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.textfn._
import graft.functions.vector._

/** Approximate/exact nearest-neighbour search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the reference's own posture —
  * its numpy provider is a full scan, storage/numpy/provider.py:38-59, and
  * its pgvector schema creates no ANN index, pgvector/models.py:86-87).
  *
  * Scale paths:
  *  - [[lshBuckets]]/[[lshTopK]]: random-hyperplane (SimHash) bucketing — the
  *    probe only scans its own bucket(s); bucket key is an equi-join key so
  *    the scan is partition-pruned at 100 TB when the index is written
  *    partitioned by bucket.
  *  - [[ivfTopK]]: inverted-file: k-means-style centroids (deterministically
  *    seeded sample), each vector assigned to nearest centroid; probes scan
  *    `nProbe` nearest cells only.
  */
object SimilaritySearch {

  /** Exact brute-force top-k for a batch of probe vectors: score every
    * (probe, item) pair per probe, keep top-k per probe.
    *
    * The probe set is broadcast (it is small by construction); the item scan
    * is embarrassingly parallel; per-probe top-k is a window over the scored
    * pairs — the one shuffle, on the probe id. For single-probe use
    * [[graft.query.Retrieval.knn]] which avoids the shuffle entirely via
    * TakeOrderedAndProject.
    */
  def bruteForceTopK(items: DataFrame, probes: DataFrame, k: Int = 10,
                     itemId: String = "vec_id", itemVec: String = "embedding",
                     probeId: String = "qid", probeVec: String = "qv"): DataFrame = {
    val scored = items.crossJoin(broadcast(probes))
      .select(col(probeId), col(itemId),
        round(vec_cosine(col(itemVec), col(probeVec)), 6).as("score"))
    val w = Window.partitionBy(col(probeId)).orderBy(desc("score"), col(itemId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic random-hyperplane LSH bucket id (`bits`-bit SimHash of the
    * embedding): bit j = sign of <v, h_j> where hyperplane h_j components are
    * ±1 derived from md5(j:i). Identical across engines and runs — the SQL
    * twin bakes the same sign matrix in as literals, and the compiled kernel
    * accumulates in the same left-to-right double order.
    */
  def lshBucket(vecCol: Column, dims: Int, bits: Int = 8): Column =
    graft.functions.textkernel.lsh_bucket(vecCol, dims, bits)

  /** ±1 hyperplane component: parity of the first md5 byte of "j:i". */
  def hyperplaneSign(j: Int, i: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$j:$i".getBytes("UTF-8"))
    (h(0) & 1) == 0
  }

  /** Assign every item its LSH bucket — the index-build side. Written
    * partitioned by `bucket`, probes read one partition (partition pruning).
    */
  def lshBuckets(items: DataFrame, dims: Int, bits: Int = 8,
                 itemVec: String = "embedding"): DataFrame =
    items.withColumn("bucket", lshBucket(col(itemVec), dims, bits))

  /** Approximate top-k: probe scans only items whose bucket is within
    * `maxHamming` of the probe's bucket (multi-probe LSH), then exact
    * rerank. Equi-join on bucket when maxHamming=0.
    */
  def lshTopK(items: DataFrame, probes: DataFrame, dims: Int, k: Int = 10,
              bits: Int = 8, maxHamming: Int = 1,
              itemId: String = "vec_id", itemVec: String = "embedding",
              probeId: String = "qid", probeVec: String = "qv"): DataFrame = {
    val bucketed = items.withColumn("__ib", lshBucket(col(itemVec), dims, bits))
    val probed = probes.withColumn("__pb", lshBucket(col(probeVec), dims, bits))
    val joined = bucketed.join(broadcast(probed),
      hamming(col("__ib"), col("__pb")) <= maxHamming)
    val scored = joined.select(col(probeId), col(itemId),
      round(vec_cosine(col(itemVec), col(probeVec)), 6).as("score"))
    val w = Window.partitionBy(col(probeId)).orderBy(desc("score"), col(itemId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF: pick `nCells` deterministic centroid seeds (lowest md5 of id —
    * a deterministic uniform sample), assign every item to its nearest
    * centroid, and for each probe scan the `nProbe` nearest cells only.
    * The centroid table is tiny and broadcast everywhere; the cell id is the
    * partition key at scale.
    */
  def ivfAssign(items: DataFrame, nCells: Int = 16,
                itemId: String = "vec_id", itemVec: String = "embedding"): (DataFrame, DataFrame) = {
    val centroids = items
      .withColumn("__h", hexhash60(concat(lit("ivf:"), col(itemId))))
      .orderBy(col("__h").asc, col(itemId).asc).limit(nCells)
      .select(col(itemId).as("cid"), col(itemVec).as("cv"))
    val assigned = items.crossJoin(broadcast(centroids))
      .withColumn("__d", vec_l2(col(itemVec), col("cv")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(itemId)).orderBy(col("__d").asc, col("cid").asc)))
      .filter(col("__rn") === 1)
      .select(items.columns.map(col) :+ col("cid").as("cell"): _*)
    (assigned, centroids)
  }

  def ivfTopK(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
              k: Int = 10, nProbe: Int = 4,
              itemId: String = "vec_id", itemVec: String = "embedding",
              probeId: String = "qid", probeVec: String = "qv"): DataFrame = {
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("__d", vec_l2(col(probeVec), col("cv")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(probeId)).orderBy(col("__d").asc, col("cid").asc)))
      .filter(col("__rn") <= nProbe)
      .select(col(probeId), col(probeVec), col("cid").as("cell"))
    val scored = assigned.join(broadcast(probeCells), Seq("cell"))
      .select(col(probeId), col(itemId),
        round(vec_cosine(col(itemVec), col(probeVec)), 6).as("score"))
    val w = Window.partitionBy(col(probeId)).orderBy(desc("score"), col(itemId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
