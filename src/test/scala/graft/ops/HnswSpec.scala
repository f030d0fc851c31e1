package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Sharded HNSW: exact-mode equivalence with brute force (the gate
  * semantics), determinism across runs and shard counts in exact mode,
  * recall at realistic ef, and the structural level-0 chain that makes
  * the exactness guarantee provable.
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic vectors: 500 points in 16 dims, clustered. */
  private def vecs(n: Int = 500, dims: Int = 16) = {
    (0 until n).map { i =>
      val c = i % 7 // cluster
      (i.toLong, Array.tabulate(dims) { d =>
        (math.sin(c * 31 + d * 7) + 0.01 * math.cos(i * 13 + d)).toFloat
      }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def probesOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.filter(col("vec_id") < k)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("exact mode (ef >= shard size) reproduces brute-force top-k exactly") {
    val items = vecs()
    val probes = probesOf(items, 5)
    val exact = SimilaritySearch.bruteForceTopK(items, probes, k = 10)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val hnsw = Hnsw.hnswTopK(items, probes, dims = 16, k = 10,
      m = 6, efConstruction = 24, ef = 1 << 20, shards = 4)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(hnsw == exact)
  }

  test("exact mode is shard-count invariant and run-deterministic") {
    val items = vecs(300)
    val probes = probesOf(items, 3)
    def run(shards: Int) = Hnsw.hnswTopK(items, probes, dims = 16, k = 8,
      m = 4, efConstruction = 16, ef = 1 << 20, shards = shards)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    val a = run(2); val b = run(5); val c = run(2)
    assert(a == b, "shard count must not change the exact result")
    assert(a == c, "same params must reproduce bit-identically")
  }

  test("realistic ef: recall@10 >= 0.9 on the clustered corpus at a fraction of exact cost") {
    val items = vecs(2000)
    val probes = probesOf(items, 20)
    val truth = SimilaritySearch.bruteForceTopK(items, probes, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Hnsw.hnswTopK(items, probes, dims = 16, k = 10,
      m = 8, efConstruction = 48, ef = 48, shards = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (approx & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("tiny and empty shards do not break: n=1 corpus, n < shards") {
    val one = Seq((42L, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val p = one.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val r = Hnsw.hnswTopK(one, p, dims = 8, k = 3, shards = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(r.length == 1 && r.head._2 == 42L && r.head._4 == 1)
    val few = (0L until 3L).map(i => (i, Seq.fill(8)(i.toFloat + 1f))).toDF("vec_id", "embedding")
    val fp = few.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val fr = Hnsw.hnswTopK(few, fp, dims = 8, k = 3, ef = 1 << 20, shards = 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(fr.length == 3)
  }

  test("persisted index: indexed exact search equals the stateless exact search") {
    val items = vecs(400)
    val probes = (0 until 4).map { i =>
      (i.toLong, Array.tabulate(16)(d => (math.sin(i * 31 + d * 7)).toFloat).toSeq)
    }
    val probeDf = probes.toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_idx").toString
    Hnsw.hnswIndexWrite(items, tmp, dims = 16, m = 6, efConstruction = 24, shards = 4)
    val stateless = Hnsw.hnswTopK(items, probeDf, dims = 16, k = 8,
      m = 6, efConstruction = 24, ef = 1 << 20, shards = 4)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val indexed = Hnsw.hnswTopKIndexed(spark, tmp, probes, k = 8, ef = 1 << 20)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(indexed == stateless)
  }

  test("persisted index + delta: new wins over stale graph vectors, inserts merge in") {
    val items = vecs(300)
    val probes = Seq((0L, Seq.fill(16)(0.5f)))
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_delta").toString
    Hnsw.hnswIndexWrite(items, tmp, dims = 16, m = 6, efConstruction = 24, shards = 3)
    // delta: id 7 UPDATED to (almost) the probe vector, id 9000 INSERTED as
    // an exact match — both must surface; stale id-7 graph rows must not
    val delta = Seq(
      (7L, Seq.fill(16)(0.5f)),
      (9000L, Seq.fill(16)(0.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val r = Hnsw.hnswTopKIndexed(spark, tmp, probes, k = 3, ef = 1 << 20,
      delta = Some(delta))
      .select("vec_id", "rank").as[(Long, Int)].collect().toMap
    assert(r.contains(7L) && r.contains(9000L), s"delta rows must win: $r")
    // exact-mode equivalence with brute force over the overlaid corpus
    val overlaid = items.filter(!col("vec_id").isin(7L)).unionByName(delta)
    val truth = SimilaritySearch.bruteForceTopK(overlaid,
      probes.toDF("qid", "qv").select(col("qid"), col("qv").cast("array<float>").as("qv")),
      k = 3).select("vec_id", "rank").as[(Long, Int)].collect().toMap
    assert(r == truth)
  }

  test("probe-batch bound is loud") {
    val items = vecs(50)
    val probes = items.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val big = (0L until 5000L).map(i => (i, Seq.fill(16)(0.1f))).toDF("qid", "qv")
    val e = intercept[IllegalArgumentException] {
      Hnsw.hnswTopK(items, big, dims = 16, k = 3)
    }
    assert(e.getMessage.contains("probe batch too large"))
  }
}
