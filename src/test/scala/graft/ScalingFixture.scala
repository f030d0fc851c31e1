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
  *  - embeddings: replica k applies the ORTHOGONAL transform
  *    T_k = D_(k div dims) ∘ R_(k mod dims) — a dimension rotation composed
  *    with an md5-parity diagonal ±1 sign flip. Any orthogonal transform
  *    shared by a replica preserves its pairwise cosines EXACTLY (rotation
  *    permutes the dot-product terms, ±1 is exact in float), while distinct
  *    transforms decorrelate replicas. The sign layer exists because a bare
  *    rotation repeats after `dims` replicas — a 1000× fixture would
  *    otherwise contain ~16 EXACT copies of every vector, flooding the
  *    near-dup buckets with a copy artifact. D_0 = identity, so fixtures
  *    with ≤ dims replicas are byte-identical to the rotation-only design.
  *    Exactly one vec_id=0 probe row survives (replica 0, untransformed);
  *  - ids offset by k·10^7 so id-derived determinism (salts, tie-breaks)
  *    stays collision-free;
  *  - all other tables symlink to the source dir, so the fixture dir is a
  *    drop-in SPARK_GRAFT_SF_DIR.
  *
  * Built as ONE crossJoin-with-replica-range plan per table (not an N-way
  * union, which chokes the planner at N=1000) with the embedding transform
  * in a typed mapPartitions loop (the HOF formulation evaluates its lambda
  * interpreted per ELEMENT — 12.8B evaluations at 1000×).
  */
object ScalingFixture {

  /** ±1 per (signSet j, dim i) from md5 parity; j=0 is all +1 (identity). */
  private[graft] def signRow(j: Int, dims: Int): Array[Float] =
    if (j == 0) Array.fill(dims)(1.0f)
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dims) { i =>
        val h = md.digest(s"sign:$j:$i".getBytes("UTF-8"))
        md.reset()
        if ((h(0) & 1) == 0) 1.0f else -1.0f
      }
    }

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
    import spark.implicits._
    try {
      val reps = spark.range(replicas).toDF("k")

      val docs = spark.read.parquet(s"$src/documents.parquet")
      docs.crossJoin(broadcast(reps))
        .select(
          (col("doc_id") + col("k") * offset).as("doc_id"),
          when(col("k") === 0, col("text"))
            .otherwise(regexp_replace(col("text"), lit("([A-Za-z0-9]+)"),
              concat(lit("$1zq"), col("k")))).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast(docs.schema("n_chars").dataType))
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
      embs.select(col("vec_id"), col("embedding"), col("label"))
        .crossJoin(broadcast(reps))
        .as[(Long, Array[Float], String, Long)]
        .mapPartitions { it =>
          val signCache = scala.collection.mutable.HashMap.empty[Int, Array[Float]]
          it.map { case (id, emb, label, kL) =>
            val k = kL.toInt
            val outArr =
              if (k == 0) emb
              else {
                val rot = k % dims
                val signs = signCache.getOrElseUpdate(k / dims, signRow(k / dims, dims))
                // out(i) = emb((i + rot) % dims) * sign(i) — same index
                // convention as the HOF formulation this replaces
                val o = new Array[Float](emb.length)
                var i = 0
                while (i < emb.length) {
                  o(i) = emb((i + rot) % dims) * signs(i)
                  i += 1
                }
                o
              }
            (id + k * offset, outArr, label)
          }
        }
        .toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>"))
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
