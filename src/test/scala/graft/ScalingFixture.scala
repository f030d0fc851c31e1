package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope, not part of the driver contract): materialize an
  * N× scale-up of the sf0.1 documents/embeddings fixtures for scaling-curve
  * measurements — `Test/runMain graft.ScalingFixture [srcDir] [outDir] [N]`.
  *
  * The replication is designed so the WORKLOAD SHAPE scales linearly and
  * nothing degenerates into an artifact of copying:
  *
  *  - documents: replica k salts every word with an ALPHANUMERIC `zqk`
  *    suffix — the tokenizer splits on non-alphanumerics, so an `_k` salt
  *    would tokenize as a separate token and distort every n-gram; the
  *    in-word suffix keeps each salted word ONE token, making the
  *    shingle-set transform bijective: WITHIN-replica Jaccard structure
  *    (dup clusters, LSH bucket shapes) is preserved exactly while
  *    CROSS-replica shingle overlap is zero (no fake 10-way dup explosion);
  *  - embeddings: replica k ROTATES each vector's dimensions by k — within
  *    a replica every pairwise cosine is invariant under the shared
  *    rotation, across replicas vectors decorrelate (no near-identical
  *    copies flooding the near-dup buckets); exactly one vec_id=0 probe
  *    row survives (replica 0, unrotated);
  *  - ids offset by k·10^7 so id-derived determinism (salts, tie-breaks)
  *    stays collision-free;
  *  - all other tables symlink to the source dir, so the fixture dir is a
  *    drop-in SPARK_GRAFT_SF_DIR.
  */
object ScalingFixture {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val offset = 10_000_000L

    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("graft-scaling-fixture").getOrCreate()
    try {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until replicas).map { k =>
        docs.select(
          (col("doc_id") + lit(k * offset)).as("doc_id"),
          (if (k == 0) col("text")
           else regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1zq" + k)).as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast(docs.schema("n_chars").dataType))
      }.reduce(_.unionByName(_))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")

      // Pin the bijectivity invariant: salting must keep each word ONE
      // token, so the fixture's token count is exactly replicas × base.
      // (A separator-introducing salt like `_k` would double it and
      // silently distort every n-gram workload measured on the fixture.)
      val tokens = (df: org.apache.spark.sql.DataFrame) =>
        df.select(sum(size(split(col("text"), "[^A-Za-z0-9]+")))).head().getLong(0)
      val baseTok = tokens(docs)
      val fixTok = tokens(spark.read.parquet(s"$out/documents.parquet"))
      require(fixTok == baseTok * replicas,
        s"salt broke token bijectivity: $fixTok tokens, expected ${baseTok * replicas}")

      val embs = spark.read.parquet(s"$src/embeddings.parquet")
      val dims = embs.select(size(col("embedding"))).head().getInt(0)
      (0 until replicas).map { k =>
        embs.select(
          (col("vec_id") + lit(k * offset)).as("vec_id"),
          (if (k == 0) col("embedding")
           else transform(sequence(lit(0), lit(dims - 1)),
             i => element_at(col("embedding"), ((i + lit(k)) % dims) + 1))).as("embedding"),
          col("label"))
      }.reduce(_.unionByName(_))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

      val fs = java.nio.file.FileSystems.getDefault
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events").foreach { t =>
        val link = fs.getPath(s"$out/$t.parquet")
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(link, fs.getPath(s"$src/$t.parquet"))
      }
      val nd = spark.read.parquet(s"$out/documents.parquet").count()
      val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
      println(s"[fixture] $out: documents=$nd embeddings=$ne (x$replicas of $src)")
    } finally spark.stop()
  }
}
