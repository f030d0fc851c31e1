package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.MaterializeSyntax
import graft.functions.textfn._
import graft.functions.textkernel._
import graft.functions.vector._

/** Deduplication operators for training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design: every near-dup variant is CANDIDATE GENERATION (an equi-join
  * on a bucket key — hash-partitioned shuffle, no cross join) followed by
  * exact verification on the candidate pairs only. At 100 TB the bucket join
  * is the only shuffle and its width is the candidate-pair count, not N².
  * All hashes are md5-derived so results are deterministic across engines.
  */
object Dedup {

  /** Exact dedup on normalized content: md5 of the lower-cased word stream.
    * Map-side-combined groupBy on the digest; canonical = min doc_id.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), md5(concat_ws(" ", word_tokens(col(textCol)))).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_dups"), min("doc_id").as("canonical_id"))

  /** Per-document MinHash signature: `numHashes` min-hashes over distinct
    * word `shingleSize`-shingles. NULL signature entries when the doc has
    * fewer than `shingleSize` words.
    */
  def minhashSignature(docs: DataFrame, textCol: String = "text",
                       numHashes: Int = 16, shingleSize: Int = 3): DataFrame = {
    val sigCols = (0 until numHashes).map(j => element_at(col("__sig"), j + 1).as(s"mh$j"))
    docs.withColumn("__shingles", word_shingles(col(textCol), shingleSize))
      .withColumn("__sig", minhash_sig(col(textCol), numHashes, shingleSize))
      .select(col("doc_id") +: col("__shingles") +: sigCols: _*)
  }

  /** Within-bucket candidate pairing with a hot-bucket escape hatch.
    *
    * `buckets` must have columns (doc_id, band, bucket). Buckets with at most
    * `hotBucketCap` members generate exact all-pairs (B²/2 — fine when B is
    * small, and it preserves full LSH recall). Buckets ABOVE the cap switch to
    * compare-to-representative: every member pairs with the bucket's min
    * doc_id only — linear per bucket. Real 100 TB corpora make huge buckets
    * routinely (boilerplate duplicated millions of times lands on ONE
    * (band,bucket) key; all-pairs there is a 10¹²-pair join from a single
    * key), and such buckets are near-total dup clusters, where the near-dup
    * relation is transitive enough that the star around the representative
    * recovers the cluster.
    *
    * The bucket-size window and the self-join hash-partition on the same
    * (band, bucket) key, so the stats pass adds no extra shuffle over the r2
    * all-pairs plan. Output keeps the id_a < id_b invariant (rep = min id).
    *
    * SATURATION TELEMETRY: the hot path drops candidates BY DESIGN — at
    * 100 TB that loss must be visible, not silent. Pass `saturation` (a
    * fresh [[org.apache.spark.sql.Observation]] per run — Spark binds an
    * Observation to exactly one action) and, when the query that consumes
    * the returned pairs runs, `saturation.get` carries:
    *  - `saturated_buckets`: how many (band, bucket) groups exceeded the cap
    *  - `skipped_pairs`: Σ over those buckets of (B·(B−1)/2 − (B−1)) — the
    *    all-pairs candidates the representative-star pairing did NOT emit,
    *    i.e. the upper bound on recall loss from capping.
    * Implemented as a CollectMetrics node on the hot branch only (rows flow
    * through it exactly once; the small branch self-join never touches it),
    * with one marker row per saturated bucket (the second-smallest id, a
    * min-over-window — no sort added). Zero plan change when None.
    */
  private[graft] def cappedBucketPairs(buckets: DataFrame, hotBucketCap: Int,
                                       saturation: Option[Observation] = None,
                                       subBucket: Boolean = false): DataFrame = {
    val w = Window.partitionBy("band", "bucket")
    val base = buckets
      .withColumn("__bsz", count(lit(1)).over(w))
      .withColumn("__rep", min("doc_id").over(w))
    val sized = saturation.fold(base)(_ => base.withColumn("__snd",
      min(when(col("doc_id") =!= col("__rep"), col("doc_id"))).over(w)))
    val small = sized.filter(col("__bsz") <= hotBucketCap)
    val a = small.as("a")
    val b = small.as("b")
    val smallPairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val hot = sized.filter(col("__bsz") > hotBucketCap && col("doc_id") =!= col("__rep"))
    val hotObserved = saturation.fold(hot)(obs => hot.observe(obs,
      coalesce(sum(when(col("doc_id") === col("__snd"), lit(1L))), lit(0L))
        .as("saturated_buckets"),
      coalesce(sum(when(col("doc_id") === col("__snd"),
        col("__bsz") * (col("__bsz") - lit(1L)) / lit(2L) - (col("__bsz") - lit(1L)))), lit(0L))
        .as("skipped_pairs")))
    val hotPairs = hotObserved.select(col("__rep").as("id_a"), col("doc_id").as("id_b"))
    // TWO-LEVEL SUB-BUCKETING (opt-in): the star pairing recovers the
    // CLUSTER (rep ↔ everyone) but misses member↔member PAIRS — at heavy
    // saturation pair recall floors near the star fraction (measured at
    // 0.809 within-corpus at 2M vectors, SCALING.md). With `subBucket`,
    // every hot-bucket member also lands in a deterministic sub-bucket of
    // expected size ≈ cap (nsub = ⌈bsz/cap⌉, slot = md5 of
    // band:bucket:doc_id — so each band re-deals the sub split
    // independently and rotations compound recall exactly like bands do),
    // and each sub-bucket does exact all-pairs. Cost stays LINEAR per hot
    // bucket: B/cap subs × cap²/2 pairs = B·cap/2 — a cap/2 constant over
    // the star, never the B²/2 explosion the cap exists to prevent.
    val allPairs = if (!subBucket) smallPairs.union(hotPairs) else {
      val hotAll = sized.filter(col("__bsz") > hotBucketCap)
        .withColumn("__nsub", expr(s"(__bsz + ${hotBucketCap - 1}) div $hotBucketCap"))
        .withColumn("__sub", hexhash60(concat(lit("sub:"), col("band").cast("string"),
          lit(":"), col("bucket").cast("string"), lit(":"),
          col("doc_id").cast("string"))) % col("__nsub"))
      val sa = hotAll.as("sa")
      val sb = hotAll.as("sb")
      val subPairs = sa.join(sb,
          col("sa.band") === col("sb.band") && col("sa.bucket") === col("sb.bucket") &&
          col("sa.__sub") === col("sb.__sub") && col("sa.doc_id") < col("sb.doc_id"))
        .select(col("sa.doc_id").as("id_a"), col("sb.doc_id").as("id_b"))
      smallPairs.union(hotPairs).union(subPairs)
    }
    allPairs.dropDuplicates("id_a", "id_b")
  }

  /** Candidate-pair stage of [[minhashLsh]], exposed so specs can assert the
    * candidate count stays O(B) on a hot bucket (not B²/2).
    */
  /** MinHash band buckets per document: (doc_id, band, bucket). Carries ids
    * and bucket hashes ONLY — the shingle sets do NOT ride the ×numBands
    * explode through the shuffle (at scale that payload dominates shuffle
    * bytes); they are joined back by id on the already-deduped candidate
    * pairs for the verify step.
    */
  private[graft] def bandBuckets(docs: DataFrame, textCol: String, numHashes: Int,
                                 rowsPerBand: Int, shingleSize: Int): DataFrame =
    bandBucketsFromSig(docs
      .withColumn("__sig", minhash_sig(col(textCol), numHashes, shingleSize)),
      numHashes, rowsPerBand)

  /** [[bandBuckets]] over a precomputed `__sig` column (r19: lets callers
    * that also need the fingerprint/shingles compute ONE tokenizer pass).
    */
  private[graft] def bandBucketsFromSig(sigDf: DataFrame, numHashes: Int,
                                        rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sig = sigDf.filter(col("__sig").isNotNull)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(col("__sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), md5(concat_ws("_", parts: _*)).as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  private[graft] def minhashLshCandidates(docs: DataFrame, textCol: String, numHashes: Int,
                                          rowsPerBand: Int, shingleSize: Int,
                                          hotBucketCap: Int,
                                          saturation: Option[Observation] = None,
                                          subBucket: Boolean = false): DataFrame =
    cappedBucketPairs(
      bandBuckets(docs, textCol, numHashes, rowsPerBand, shingleSize), hotBucketCap, saturation,
      subBucket)

  /** Band parameters for a target Jaccard threshold (r17): among the
    * divisors r of `numHashes` (rowsPerBand r, bands b = numHashes/r),
    * pick the one whose S-curve inflection `t(b, r) = (1/b)^(1/r)` —
    * the similarity at which a pair's any-band collision probability
    * `1 − (1 − s^r)^b` crosses ~0.5 — sits closest to `threshold`
    * (Leskovec/Rajaraman/Ullman ch. 3, the standard tuning rule). Ties
    * break toward SMALLER r: more bands ⇒ the curve errs on RECALL,
    * and the exact-Jaccard verify step already removes false positives
    * for free, while a false negative is gone forever. Returns a named
    * [[LshParams]] (r18 advice — the former (bands, rowsPerBand) tuple
    * invited passing `bands` where a numHashes was expected; named
    * fields make that misuse fail to compile): call
    * `minhashLsh(docs, numHashes = <the numHashes you tuned for>,
    * rowsPerBand = result.rowsPerBand)` — `bands` is informational
    * (numHashes / rowsPerBand), NOT a numHashes to pass on.
    */
  def lshParams(threshold: Double, numHashes: Int = 16): LshParams = {
    require(threshold > 0 && threshold < 1, s"threshold must be in (0,1): $threshold")
    require(numHashes >= 2, s"numHashes must be >= 2: $numHashes")
    val candidates = (1 to numHashes).filter(numHashes % _ == 0)
    val best = candidates.minBy { r =>
      val b = numHashes / r
      val t = math.pow(1.0 / b, 1.0 / r)
      (math.abs(t - threshold), r)
    }
    LshParams(bands = numHashes / best, rowsPerBand = best)
  }

  /** [[lshParams]] result: `rowsPerBand` is the value to pass to
    * [[minhashLsh]]; `bands` = numHashes / rowsPerBand is informational.
    */
  final case class LshParams(bands: Int, rowsPerBand: Int)

  /** MinHash+LSH near-dup candidate pairs with exact Jaccard verification.
    *
    * Banding: `numHashes` hashes in bands of `rowsPerBand`; docs sharing ANY
    * band bucket become candidates (standard LSH S-curve). The band-bucket
    * join is an equi-join on (band_index, bucket_hash) — shuffle on the
    * bucket key only. Buckets larger than `hotBucketCap` degrade to linear
    * compare-to-representative pairing (see [[cappedBucketPairs]]).
    * Candidates are deduped then verified with exact Jaccard over the
    * shingle sets; pairs below `threshold` are dropped.
    */
  def minhashLsh(docs: DataFrame, textCol: String = "text", threshold: Double = 0.5,
                 numHashes: Int = 16, rowsPerBand: Int = 2, shingleSize: Int = 3,
                 hotBucketCap: Int = 64,
                 saturation: Option[Observation] = None,
                 subBucket: Boolean = false): DataFrame = {
    // ONE tokenizer pass (r19): signature + shingles together, materialized
    // (per-call lineage cut) — banding and the two verify joins previously
    // each re-tokenized the corpus from the text column
    val feats = docs.select(col("doc_id"),
        minhash_sig(col(textCol), numHashes, shingleSize).as("__sig"),
        shingle_hashes(col(textCol), shingleSize).as("__sh"))
      .materialize(true)
    val candidates = cappedBucketPairs(
      bandBucketsFromSig(feats.select(col("doc_id"), col("__sig")), numHashes, rowsPerBand),
      hotBucketCap, saturation, subBucket)
    val shingles = feats.select(col("doc_id"), col("__sh"))
    candidates
      .join(shingles.select(col("doc_id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(shingles.select(col("doc_id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard_sorted(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash per document (bit-sampled fingerprint of the word set). */
  def simhashDocs(docs: DataFrame, textCol: String = "text", bits: Int = 16): DataFrame =
    docs.select(col("doc_id"), simhash_fast(col(textCol), bits).as("simhash"))

  /** Candidate-pair stage of [[simhashPairs]] (ids only), exposed for the
    * hot-bucket O(B) spec.
    */
  private[graft] def simhashCandidates(docs: DataFrame, textCol: String, bits: Int,
                                       bandBits: Int, hotBucketCap: Int,
                                       saturation: Option[Observation] = None): DataFrame = {
    val sh = simhashDocs(docs, textCol, bits)
    val numBands = bits / bandBits
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until numBands).map(bi =>
      struct(lit(bi).as("band"), shiftright(col("simhash"), bi * bandBits).bitwiseAND(lit(mask)).as("bucket")))
    val banded = sh.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    cappedBucketPairs(banded, hotBucketCap, saturation)
  }

  /** SimHash near-dup pairs: band the fingerprint into `bits/bandBits`
    * bands; docs equal on any band are candidates (multi-probe for Hamming
    * tolerance); verify Hamming distance ≤ maxHamming. Buckets larger than
    * `hotBucketCap` degrade to linear compare-to-representative pairing
    * (see [[cappedBucketPairs]]). Like [[minhashLsh]], candidates carry ids
    * only; fingerprints are joined back for the Hamming verify.
    */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
                   bits: Int = 16, bandBits: Int = 4, maxHamming: Int = 3,
                   hotBucketCap: Int = 64,
                   saturation: Option[Observation] = None): DataFrame = {
    // ONE fingerprint pass (r19): the banding stage and both verify joins
    // previously each re-ran the simhash kernel over the corpus; narrow
    // (id, long) rows, per-call lineage cut only
    val sh = simhashDocs(docs, textCol, bits).materialize(true)
    val numBands = bits / bandBits
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until numBands).map(bi =>
      struct(lit(bi).as("band"), shiftright(col("simhash"), bi * bandBits).bitwiseAND(lit(mask)).as("bucket")))
    val banded = sh.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val candidates = cappedBucketPairs(banded, hotBucketCap, saturation)
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("simhash").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("simhash").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity join within a blocking key (e.g. same
    * source bucket). Blocking keeps the pair space linear-ish; the join is an
    * equi-join on the block key. Use [[minhashLsh]] when no natural blocking
    * key exists.
    */
  def ngramJaccardJoin(docs: DataFrame, blockCol: String, textCol: String = "text",
                       shingleSize: Int = 3, threshold: Double = 0.0): DataFrame = {
    val withSh = docs.select(col("doc_id"), col(blockCol).as("__block"),
      shingle_hashes(col(textCol), shingleSize).as("__sh"))
    val a = withSh.as("a"); val b = withSh.as("b")
    a.join(b, col("a.__block") === col("b.__block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(jaccard_sorted(col("a.__sh"), col("b.__sh")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Resolve candidate PAIRS into duplicate CLUSTERS: connected components
    * with cluster id = min doc_id in the component (the canonical document
    * — "keep the lowest id, drop the rest" is the standard dedup policy).
    *
    * ADAPTIVE, like a broadcast join: the pair set is materialized once
    * (it is iterated either way); at or under `driverCap` pairs it is
    * collected and solved with a driver union-find (path-compressed,
    * min-id representative — microseconds, no per-round Spark jobs at
    * all), above the cap the distributed loop below runs. LSH/near-dup
    * pair sets are ≪ corpus by construction, so the driver path is the
    * common case. Driver state is PRIMITIVE arrays only (sorted long[]
    * ids + int[] parents, ~12 B/node — no boxed map), so the default cap
    * (1M pairs, ≤ 2M nodes) costs ~24 MB of heap plus the transient
    * collected pair array; the distributed path is spec-pinned by forcing
    * `driverCap = 0`.
    *
    * Distributed regime — min-label propagation WITH POINTER DOUBLING: each round
    * every node takes the min of its own label and its neighbours' labels
    * (ONE equi-join + min-agg via flagged self-loops, map-side combinable),
    * and from round 2 also its representative's previous label. The
    * shortcut is what the large-star move of star-contraction algorithms
    * buys — a node adopts its representative's representative — so the
    * label-to-root distance roughly DOUBLES per round and rounds are
    * O(log diameter), not O(diameter): a 1k-node path chain converges in
    * ~13 rounds where plain propagation needs 999 (spec-pinned). Dup
    * clusters from representative-star pairing ([[cappedBucketPairs]] hot
    * path, [[graft.streaming.StreamingOps.streamingNearDupCandidates]])
    * have diameter ≤ 2 and converge in ~3 rounds with NO jump join at all
    * (the jump only engages from round 2); each round is a bounded-size
    * shuffle over the PAIR set (≪ corpus). Lineage is truncated per round
    * (local RDD checkpoint) so plans don't grow with iterations, and the
    * convergence probe rides THAT materialization job via an accumulator —
    * exactly ONE Spark job per round, not a checkpoint job plus a probe
    * job. (Accumulator overcount on a task retry can only inflate a
    * positive changed-count, never fake convergence.) Deterministic:
    * integer labels only.
    *
    * Hitting `maxIters` without converging means labels are NOT final
    * cluster ids (silent under-dedup); with `strict` (default) that raises,
    * otherwise it logs a warning and returns the partial labels.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 20, strict: Boolean = true,
                  driverCap: Long = 1_000_000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the directed pair set ONCE (the loop would iterate over
    // it anyway); its checkpointed count decides the regime for free
    val directed = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .materialize(true)
    if (directed.count() <= driverCap) {
      // PRIMITIVE-ARRAY union-find: the only per-node state is a sorted
      // long[] of distinct ids (slot = binary search) and an int[] parent
      // of slot indices — ~12 B/node, no boxing, no hash map. At the
      // default cap (1M pairs ≤ 2M nodes) that is ~24 MB of driver heap;
      // a boxed HashMap[Long,Long] of the same nodes costs ~10× that.
      val pairArr = directed.select("src", "dst").as[(Long, Long)].collect()
      val ids = {
        val all = new Array[Long](pairArr.length * 2)
        var i = 0
        while (i < pairArr.length) {
          all(2 * i) = pairArr(i)._1; all(2 * i + 1) = pairArr(i)._2; i += 1
        }
        java.util.Arrays.sort(all)
        var n = 0
        var j = 0
        while (j < all.length) {
          if (n == 0 || all(j) != all(n - 1)) { all(n) = all(j); n += 1 }
          j += 1
        }
        java.util.Arrays.copyOf(all, n)
      }
      val parent = Array.tabulate(ids.length)(identity)
      def find(s: Int): Int = {
        var r = s
        while (parent(r) != r) r = parent(r)
        var c = s
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      var i = 0
      while (i < pairArr.length) {
        val ra = find(java.util.Arrays.binarySearch(ids, pairArr(i)._1))
        val rb = find(java.util.Arrays.binarySearch(ids, pairArr(i)._2))
        // min-id root: the canonical-representative policy falls out of the
        // union itself, no relabel pass (slot order = id order, ids sorted)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        i += 1
      }
      // the result is driver-built — the checkpointed pair table is dead;
      // release its blocks now rather than after the next full driver GC
      graft.core.Checkpoints.release(directed)
      return spark.createDataset(
          ids.indices.map(s => (ids(s), ids(find(s))))) (
          org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
        .toDF("doc_id", "cluster_id")
    }
    val sym = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
    // flagged SELF-LOOP per node: the neighbour join then carries each
    // node's own label through the same aggregation (min = propagation
    // step, min-over-self-loop = previous label for the change flag) — one
    // join + one agg per round, not two joins
    val edges = sym
      .union(sym.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))
      .withColumn("__self", col("src") === col("dst"))
      .materialize(true)
    val labelSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id", org.apache.spark.sql.types.LongType, nullable = false)))
    var labels = edges.filter(col("__self")).select(col("src").as("doc_id"))
      .withColumn("cluster_id", col("doc_id"))
      .materialize(true)
    // `edges` checkpoints cut lineage back to `directed` — its blocks are
    // dead as soon as edges materializes (localCheckpoint(true) is eager)
    graft.core.Checkpoints.release(directed)
    val changed = spark.sparkContext.longAccumulator("graft.dupClusters.changed")
    var converged = false
    var it = 0
    // each round's checkpoint supersedes the previous round's — release the
    // superseded blocks as we go (only the FINAL round's RDD backs the
    // returned labels)
    var prevRoundRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    val initialLabels = labels
    while (!converged && it < maxIters) {
      // neighbour-min step: labels only ever DECREASE, toward the component
      // min; the self-loop row carries the node's previous label
      val half = edges
        .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("cluster_id", "__l"),
          Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("__l")).as("__new"),
          min(when(col("__self"), col("__l"))).as("__old"))
      // pointer-doubling from round 2 on: adopt the representative's label
      // from the PREVIOUS (checkpointed) round, so the label-to-root
      // distance roughly doubles per round — O(log diameter) rounds on deep
      // chains. Rounds 0-1 skip it: the jump is a no-op while labels are ≤ 2
      // hops deep, and the designed hot path (star pairing, diameter ≤ 2)
      // then converges with no extra join at all.
      val stepped = (if (it < 2) half.select(col("doc_id"), col("__new").as("cluster_id"),
          (col("__new") < col("__old")).as("__changed"))
        else half
          .join(labels.select(col("doc_id").as("__pid"), col("cluster_id").as("__pl")),
            col("__new") === col("__pid"), "left")
          .select(col("doc_id"),
            least(col("__new"), coalesce(col("__pl"), col("__new"))).as("cluster_id"),
            (least(col("__new"), coalesce(col("__pl"), col("__new"))) < col("__old")).as("__changed")))
      changed.reset()
      // fold the changed-count into the checkpoint materialization itself:
      // the count() below is the round's ONLY job
      val rdd = stepped.queryExecution.toRdd.mapPartitions { rows =>
        rows.map { r =>
          if (r.getBoolean(2)) changed.add(1L)
          org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))
        }
      }
      rdd.localCheckpoint()
      rdd.count()
      converged = changed.value == 0
      // this round is materialized — the previous round's checkpoint (or
      // the initial label table on round 1) is now unreachable from the
      // result; drop its blocks
      if (prevRoundRdd != null) prevRoundRdd.unpersist(false)
      else graft.core.Checkpoints.release(initialLabels)
      prevRoundRdd = rdd
      labels = spark.createDataFrame(rdd, labelSchema)
      it += 1
    }
    // edges fed its last join; the returned labels are checkpoint-backed
    // with no lineage into it
    graft.core.Checkpoints.release(edges)
    if (!converged) {
      val msg = s"dupClusters did not converge within maxIters=$maxIters " +
        "— labels are NOT final cluster ids (chain deeper than the iteration budget)"
      if (strict) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels
  }

  /** End-to-end near-dup DEDUP: MinHash-LSH candidate pairs (verified at
    * `threshold` Jaccard) → [[dupClusters]] → drop every non-canonical
    * cluster member. The anti-join touches only clustered ids (≪ corpus);
    * untouched documents pass through unscanned by the join.
    */
  def dedupCorpus(docs: DataFrame, textCol: String = "text",
                  threshold: Double = 0.7, numHashes: Int = 16,
                  rowsPerBand: Int = 2, shingleSize: Int = 3,
                  hotBucketCap: Int = 64,
                  saturation: Option[Observation] = None): DataFrame = {
    val pairs = minhashLsh(docs, textCol, threshold, numHashes, rowsPerBand,
      shingleSize, hotBucketCap, saturation)
    val losers = dupClusters(pairs.select(col("id_a"), col("id_b")))
      .filter(col("doc_id") =!= col("cluster_id")) // canonical survives
    docs.join(losers.select(col("doc_id")), Seq("doc_id"), "left_anti")
  }

  /** [[dedupCorpus]] with QUALITY-RANKED retention: instead of the min-id
    * member, each near-dup cluster keeps its highest-`scoreCol` member
    * (ties broken by min doc_id — fully deterministic). This is the
    * standard production policy ("keep the longest / highest-quality copy"
    * — C4 keeps longest-per-URL, most CommonCrawl-derived sets keep the
    * best-scored page of a boilerplate cluster); min-id retention throws
    * away quality signal the pipeline already computed.
    *
    * Plan shape on top of [[dedupCorpus]]: one extra shuffle — the
    * (cluster member → score) join plus a map-side-combined
    * `max(struct(score, −doc_id))` per cluster (the argmax travels as one
    * struct; no per-cluster sort, no window over the corpus). Cluster
    * labels come from [[dupClusters]] unchanged — which label names the
    * cluster is irrelevant to retention, only membership matters.
    */
  def dedupCorpusKeepBest(docs: DataFrame, scoreCol: String,
                          textCol: String = "text", threshold: Double = 0.7,
                          numHashes: Int = 16, rowsPerBand: Int = 2,
                          shingleSize: Int = 3, hotBucketCap: Int = 64,
                          saturation: Option[Observation] = None): DataFrame = {
    val pairs = minhashLsh(docs, textCol, threshold, numHashes, rowsPerBand,
      shingleSize, hotBucketCap, saturation)
    val clusters = dupClusters(pairs.select(col("id_a"), col("id_b")))
    val winners = clusters
      .join(docs.select(col("doc_id"), col(scoreCol).as("__q")), Seq("doc_id"))
      .groupBy("cluster_id")
      // lexicographic struct max = (max score, then MIN doc_id via negation)
      .agg(max(struct(col("__q").as("q"), (-col("doc_id")).as("nid"))).as("__k"))
      .select((-col("__k.nid")).cast("long").as("doc_id"))
    val losers = clusters.select("doc_id")
      .join(winners, Seq("doc_id"), "left_anti")
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Cross-corpus dedup: flag documents of a NEW corpus that duplicate a
    * REFERENCE corpus — the "dedup this crawl against every previous dump"
    * operation a recurring 100 TB ingest runs (CommonCrawl-derived corpora
    * dedup each snapshot against the union of prior snapshots; the new
    * side is one dump, the reference side is everything already kept).
    *
    * Two layers, both asymmetric (new-vs-ref only — never ref×ref, whose
    * pair space is the quadratic blow-up this exists to avoid):
    *
    *  1. **Exact**: normalized-text fingerprint (md5 of the lower-cased
    *     word stream, the [[TextAnalysis.fingerprint]] key) — a semi-join
    *     of new fingerprints against DISTINCT reference fingerprints.
    *  2. **Fuzzy**: MinHash band buckets on both sides ([[bandBuckets]]);
    *     candidates = (new, ref) pairs sharing any (band, bucket). The
    *     REFERENCE side of each bucket is capped to the `hotRefCap`
    *     smallest doc_ids (rank ≤ cap compiles to WindowGroupLimit —
    *     map-side bounded state), so a degenerate bucket (boilerplate
    *     shared by millions of ref pages) costs each new doc ≤ cap
    *     comparisons instead of bucket-size; the kept representatives are
    *     deterministic. Candidates are verified with exact Jaccard over
    *     shingle hash sets.
    *
    * Returns one row per NEW document: `exact_dup`, `n_ref_candidates`,
    * `max_jaccard` (0.0 when no candidates), and
    * `dup = exact_dup OR max_jaccard >= threshold`. The reference corpus
    * never moves whole: its shuffles carry (id, band, bucket) triples and
    * candidate-matched shingle arrays only.
    */
  def crossCorpusDedup(newDocs: DataFrame, refDocs: DataFrame,
                       textCol: String = "text", threshold: Double = 0.5,
                       numHashes: Int = 8, rowsPerBand: Int = 2,
                       shingleSize: Int = 3, hotRefCap: Int = 64,
                       saturation: Option[Observation] = None): DataFrame = {
    require(hotRefCap > 0, s"hotRefCap must be positive: $hotRefCap")
    // ONE tokenizer pass per side (r19): the exact, banding and verify
    // layers each re-derived fingerprint/signature/shingles from the text
    // (the gate plan re-scanned the corpus 22×); features are narrow
    // (id, 32B fp, numHashes longs, ~n_token longs) and per-call state.
    // r20 (VERDICT r19 #4, guide §2.6): the two sides are INDEPENDENT
    // eager jobs — run them concurrently so the ref side back-fills the
    // new side's straggler tail instead of serializing two full corpus
    // tokenizer passes.
    val (nf, rf) = graft.core.Concurrent.both(
      crossFeatures(newDocs, textCol, numHashes, shingleSize),
      crossFeatures(refDocs, textCol, numHashes, shingleSize))
    val exactDup = nf.select(col("doc_id"), col("__fp"))
      .join(rf.select("__fp").distinct(), Seq("__fp"), "left_semi")
      .select(col("doc_id"), lit(true).as("__exact"))
    val verified = crossRefVerified(nf, rf,
      crossRefCandidates(nf, rf, numHashes, rowsPerBand, hotRefCap, saturation))
    val agg = verified.groupBy("doc_id").agg(
      count(lit(1)).as("n_ref_candidates"), max("__j").as("max_jaccard"))
    nf.select(col("doc_id"))
      .join(exactDup, Seq("doc_id"), "left")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__exact"), lit(false)).as("exact_dup"),
        coalesce(col("n_ref_candidates"), lit(0L)).as("n_ref_candidates"),
        coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"))
      .withColumn("dup", col("exact_dup") || col("max_jaccard") >= threshold)
  }

  /** One tokenizer pass per cross-dedup side, MATERIALIZED (r19):
    * fingerprint + MinHash signature + shingle hashes together, plus any
    * `extraCols` the caller's retention policy reads (e.g. the quality
    * score). The exact/banding/verify layers all read this instead of
    * re-deriving from the text. Per-call lineage cut only — recomputed on
    * every invocation.
    */
  private def crossFeatures(docs: DataFrame, textCol: String, numHashes: Int,
                            shingleSize: Int,
                            extraCols: Seq[String] = Nil): DataFrame =
    docs.select(Seq(col("doc_id"),
        md5(concat_ws(" ", word_tokens(col(textCol)))).as("__fp"),
        minhash_sig(col(textCol), numHashes, shingleSize).as("__sig"),
        shingle_hashes(col(textCol), shingleSize).as("__sha")) ++
        extraCols.map(col): _*)
      .materialize(true)

  /** Asymmetric (new, ref) candidate pairs for the cross-corpus fuzzy
    * layer: MinHash band buckets on both sides (from the precomputed
    * [[crossFeatures]] signatures), ref side capped per bucket (the
    * [[crossCorpusDedup]] shape, factored for reuse).
    */
  private def crossRefCandidates(nf: DataFrame, rf: DataFrame,
                                 numHashes: Int, rowsPerBand: Int,
                                 hotRefCap: Int,
                                 saturation: Option[Observation]): DataFrame = {
    val nb = bandBucketsFromSig(nf.select(col("doc_id"), col("__sig")), numHashes, rowsPerBand)
    val rb = bandBucketsFromSig(rf.select(col("doc_id"), col("__sig")), numHashes, rowsPerBand)
    val w = Window.partitionBy("band", "bucket").orderBy(col("doc_id").asc)
    val rbRanked = rb.withColumn("__rn", row_number().over(w))
    // saturation telemetry on the PRE-filter stream (rows flow once):
    // `saturated_buckets` = ref buckets that overflowed the cap (one marker
    // row each at rank cap+1), `dropped_refs` = ref members above the cap —
    // the candidates a new doc can no longer be compared against.
    val rbObserved = saturation.fold(rbRanked)(obs => rbRanked.observe(obs,
      coalesce(sum(when(col("__rn") === hotRefCap + 1, lit(1L))), lit(0L))
        .as("saturated_buckets"),
      coalesce(sum(when(col("__rn") > hotRefCap, lit(1L))), lit(0L))
        .as("dropped_refs")))
    val rbCapped = rbObserved
      .filter(col("__rn") <= hotRefCap)
      .select(col("doc_id").as("ref_id"), col("band"), col("bucket"))
    nb.join(rbCapped, Seq("band", "bucket"))
      .select(col("doc_id"), col("ref_id")).distinct()
  }

  /** Exact-Jaccard verification of (doc_id, ref_id) candidate pairs:
    * precomputed [[crossFeatures]] shingle hash sets joined in,
    * similarity rounded to 6 places.
    */
  private def crossRefVerified(nf: DataFrame, rf: DataFrame,
                               cand: DataFrame): DataFrame = {
    val shNew = nf.select(col("doc_id"), col("__sha"))
    val shRef = rf.select(col("doc_id").as("ref_id"), col("__sha").as("__shb"))
    cand.join(shNew, Seq("doc_id")).join(shRef, Seq("ref_id"))
      .select(col("doc_id"), col("ref_id"),
        round(jaccard_sorted(col("__sha"), col("__shb")), 6).as("__j"))
  }

  /** [[crossCorpusDedup]] with QUALITY-AWARE retention — the recurring
    * ingest with quality RE-scoring: when a new document duplicates a
    * reference copy but scores HIGHER (`scoreCol`, e.g. a fresher quality
    * classifier), the right move is to keep the new copy and retire the
    * reference one, not to always drop the new side.
    *
    * Per NEW document this returns the decision, not just a flag:
    *  - `best_ref_id` — the strongest reference match (highest verified
    *    Jaccard, exact fingerprint matches count as 1.0; ties broken by
    *    min ref id — fully deterministic), null when not a dup;
    *  - `best_jaccard`, `new_score`, `ref_score`;
    *  - `new_wins` — new_score STRICTLY greater (ties → reference wins,
    *    so a stable corpus never churns);
    *  - `action` — `insert` (not a dup), `replace_ref` (dup, new wins:
    *    keep the new doc, retire `best_ref_id`), `drop` (dup, ref wins).
    *
    * Retired reference ids = `filter(action = 'replace_ref')
    * .select(best_ref_id).distinct()` — feed them to the index
    * tombstone path. Note the policy is per-PAIR: a new doc that loses
    * to a ref copy another new doc retires is still dropped this run
    * (both survivors carry the content; next ingest converges).
    *
    * Plan shape: the [[crossCorpusDedup]] layers with ref identity kept —
    * the exact layer's semi-join becomes an equi-join against
    * (fingerprint → min ref id), the fuzzy layer's verified pairs keep
    * ref_id, and the per-doc argmax is one map-side-combined struct-max.
    * Score joins move (id, score) pairs only; the reference corpus still
    * never moves whole.
    */
  def crossCorpusDedupKeepBest(newDocs: DataFrame, refDocs: DataFrame,
                               scoreCol: String, textCol: String = "text",
                               threshold: Double = 0.5, numHashes: Int = 8,
                               rowsPerBand: Int = 2, shingleSize: Int = 3,
                               hotRefCap: Int = 64,
                               saturation: Option[Observation] = None): DataFrame = {
    require(hotRefCap > 0, s"hotRefCap must be positive: $hotRefCap")
    // ONE tokenizer pass per side incl. the retention score (r19 — see
    // [[crossCorpusDedup]]); every layer below reads the features table.
    // r20 (guide §2.6): both sides materialized as CONCURRENT jobs.
    val (nf, rf) = graft.core.Concurrent.both(
      crossFeatures(newDocs, textCol, numHashes, shingleSize, Seq(scoreCol)),
      crossFeatures(refDocs, textCol, numHashes, shingleSize, Seq(scoreCol)))
    // exact layer WITH identity: fingerprint → deterministic min ref id
    val refFp = rf.groupBy("__fp").agg(min("doc_id").as("ref_id"))
    val exactM = nf.select(col("doc_id"), col("__fp")).join(refFp, Seq("__fp"))
      .select(col("doc_id"), col("ref_id"), lit(1.0).as("__j"))
    val fuzzyM = crossRefVerified(nf, rf,
      crossRefCandidates(nf, rf, numHashes, rowsPerBand, hotRefCap, saturation))
      .filter(col("__j") >= threshold)
    // strongest match per new doc: lexicographic struct max =
    // (max jaccard, then MIN ref id via negation)
    val best = exactM.unionByName(fuzzyM).groupBy("doc_id")
      .agg(max(struct(col("__j").as("j"), (-col("ref_id")).as("nrid"))).as("__k"))
      .select(col("doc_id"), col("__k.j").as("best_jaccard"),
        (-col("__k.nrid")).cast("long").as("best_ref_id"))
    val refScores = rf.select(col("doc_id").as("best_ref_id"),
      col(scoreCol).cast("double").as("ref_score"))
    nf.select(col("doc_id"), col(scoreCol).cast("double").as("new_score"))
      .join(best, Seq("doc_id"), "left")
      .join(refScores, Seq("best_ref_id"), "left")
      .withColumn("dup", col("best_ref_id").isNotNull)
      .withColumn("new_wins", col("dup") && col("new_score") > col("ref_score"))
      .withColumn("action",
        when(!col("dup"), "insert")
          .when(col("new_wins"), "replace_ref")
          .otherwise("drop"))
      .select(col("doc_id"), col("new_score"), col("best_ref_id"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        col("ref_score"), col("dup"), col("new_wins"), col("action"))
  }

  /** One recurring-ingest STEP under the keep-best policy
    * ([[crossCorpusDedupKeepBest]] applied): returns the post-ingest
    * corpus membership — reference docs minus the copies a
    * higher-scoring new duplicate retires, plus the accepted new docs
    * (fresh inserts and winning replacements). Output one row per
    * surviving document: (doc_id, src ∈ ref | new). Feed `src = 'new'`
    * rows to the index build and the retired ids (ref ∖ output) to the
    * tombstone path; the next dump ingests against the result.
    *
    * Plan shape: the decision table's two slices (retired ref ids —
    * DISTINCT, small; accepted new ids) are each one projection; the
    * reference side pays one broadcast-able anti-join on (id) — the
    * corpus text never moves.
    */
  def ingestKeepBest(newDocs: DataFrame, refDocs: DataFrame, scoreCol: String,
                     textCol: String = "text", threshold: Double = 0.5,
                     numHashes: Int = 8, rowsPerBand: Int = 2,
                     shingleSize: Int = 3, hotRefCap: Int = 64,
                     saturation: Option[Observation] = None): DataFrame = {
    // the decision table feeds BOTH output slices — materialize it once
    // (eager, lineage cut; one small row per new doc) instead of running
    // the two-layer match chain twice
    val decisions = crossCorpusDedupKeepBest(newDocs, refDocs, scoreCol,
      textCol, threshold, numHashes, rowsPerBand, shingleSize, hotRefCap,
      saturation)
      .select(col("doc_id"), col("best_ref_id"), col("action"))
      .materialize(true)
    val retired = decisions.filter(col("action") === "replace_ref")
      .select(col("best_ref_id").as("doc_id")).distinct()
    val accepted = decisions.filter(col("action") =!= "drop").select("doc_id")
    refDocs.select(col("doc_id"))
      .join(retired, Seq("doc_id"), "left_anti")
      .withColumn("src", lit("ref"))
      .unionByName(accepted.withColumn("src", lit("new")))
  }

  /** Build a Bloom filter over the REFERENCE corpus's normalized-text
    * fingerprints (the same md5-of-word-stream key [[crossCorpusDedup]]'s
    * exact layer joins on). One treeAggregate over the reference scan —
    * merge is bitwise OR, so partitioning never changes the result, and
    * Spark's sketch hashes with seedless Murmur3 (bit-identical across
    * runs). Returns the filter's stable serialized bytes
    * (`BloomFilter.writeTo` format) so it can be persisted next to the
    * corpus ([[writeBloomFilter]]) and reused by every later ingest
    * without touching the reference again — the recurring-dump pattern:
    * build once per accepted dump, fold with `mergeInPlace` or rebuild.
    *
    * Size the filter honestly: ~1.2 GB per 10⁹ fingerprints at 1% fpp.
    * That rides each stage's task binary once per EXECUTOR (not per task),
    * which beats re-shuffling a 100 TB reference per ingest by orders of
    * magnitude; past ~10¹⁰ fingerprints, shard the reference and probe
    * per-shard filters in sequence.
    */
  def buildFingerprintBloom(refDocs: DataFrame, textCol: String = "text",
                            expectedItems: Long = 1L << 20,
                            fpp: Double = 0.01): Array[Byte] = {
    val bf = refDocs
      .select(md5(concat_ws(" ", word_tokens(col(textCol)))).as("__fp"))
      .stat.bloomFilter("__fp", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Fold a NEW dump's fingerprints into an existing reference filter —
    * the recurring-ingest loop closure: dedup dump N against the filter,
    * accept the survivors, extend the filter with them, ingest dump N+1.
    * `mergeInPlace` is a bitwise OR, so extension never loses reference
    * coverage; fpp RISES as the filter fills beyond its built
    * `expectedItems` (Σ dumps, not one dump — size it for the corpus's
    * lifetime, or rebuild when the observed candidate share drifts up).
    */
  def extendFingerprintBloom(filterBytes: Array[Byte], newDocs: DataFrame,
                             expectedItems: Long, fpp: Double,
                             textCol: String = "text"): Array[Byte] = {
    val base = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))
    // the addition is built DISTRIBUTED with the base's ORIGINAL
    // (expectedItems, fpp) — same geometry ⇒ mergeInPlace is a bitwise OR;
    // persist those two numbers next to the filter artifact. A mismatch is
    // a caller bug surfaced loudly, never a driver-side corpus collect.
    val add = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        buildFingerprintBloom(newDocs, textCol, expectedItems, fpp)))
    require(add.isCompatible(base),
      s"filter geometry mismatch: pass the ORIGINAL build params " +
        s"(expectedItems=$expectedItems, fpp=$fpp do not reproduce the base's shape)")
    base.mergeInPlace(add)
    val bos = new java.io.ByteArrayOutputStream()
    base.writeTo(bos)
    bos.toByteArray
  }

  /** Persist / load a serialized Bloom filter as a single file through the
    * Hadoop filesystem API (works on local paths, HDFS, and object stores —
    * the filter is a corpus-level artifact, versioned next to the data).
    */
  def writeBloomFilter(spark: org.apache.spark.sql.SparkSession,
                       filterBytes: Array[Byte], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(filterBytes) finally out.close()
  }

  def readBloomFilter(spark: org.apache.spark.sql.SparkSession,
                      path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  /** Bloom-prefiltered EXACT cross-corpus dedup — the scan-speed fast path
    * for [[crossCorpusDedup]]'s exact layer on a recurring ingest. The
    * exact layer's semi-join shuffles every NEW fingerprint against the
    * distinct REFERENCE fingerprints each run; with a persisted reference
    * filter ([[buildFingerprintBloom]]) the new corpus is instead probed
    * per-row at scan speed and only the probe SURVIVORS (true matches +
    * the filter's fpp share of non-matches) enter the verification
    * semi-join — shuffle width drops from |new| to ≈ |matches| + fpp·|new|.
    *
    * The output is EXACT, not approximate: Bloom `false` is always correct
    * (those docs are flagged non-dup without ever shuffling), and Bloom
    * `true` is verified against the real reference fingerprints, so false
    * positives are eliminated — identical result to the plain semi-join,
    * oracle-verified. Pass `saturation` (fresh Observation) to observe
    * `n_probed` vs `n_candidates`: candidate share ≈ dup share + fpp, a
    * live health check on filter sizing (a saturated, undersized filter
    * shows up as a candidate share far above the expected dup rate).
    *
    * OBSERVED-FPP telemetry: [[extendFingerprintBloom]] documents that fpp
    * rises as dumps accumulate and says "rebuild when the drift shows" —
    * `verification` (a second fresh Observation; Spark binds each to one
    * plan node) gives that rule its NUMBER. It counts `n_verified`, the
    * candidates the exact semi-join confirmed, so per run:
    * observed fpp = (n_candidates − n_verified) / (n_probed − n_verified)
    * — exactly the share of true-negative probes the filter let through
    * (the denominator excludes real dups, which are not false-positive
    * material). See [[observedFpp]]. When it drifts above the built fpp,
    * rebuild the filter at the corpus's current size.
    */
  def crossCorpusExactDedupBloom(newDocs: DataFrame, refDocs: DataFrame,
                                 filterBytes: Array[Byte], textCol: String = "text",
                                 saturation: Option[Observation] = None,
                                 verification: Option[Observation] = None): DataFrame = {
    def fp(df: DataFrame) = df.select(col("doc_id"),
      md5(concat_ws(" ", word_tokens(col(textCol)))).as("__fp"))
    val probed = fp(newDocs)
      .withColumn("__cand", bloom_might_contain(col("__fp"), filterBytes))
    val observed = saturation.fold(probed)(obs => probed.observe(obs,
      count(lit(1)).as("n_probed"),
      coalesce(sum(when(col("__cand"), lit(1L))), lit(0L)).as("n_candidates")))
    val semiJoined = observed.filter(col("__cand"))
      .join(fp(refDocs).select("__fp").distinct(), Seq("__fp"), "left_semi")
    val verified = verification.fold(semiJoined)(obs => semiJoined.observe(obs,
      count(lit(1)).as("n_verified")))
      .select(col("doc_id"), lit(true).as("__exact"))
    newDocs.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__exact"), lit(false)).as("exact_dup"))
  }

  /** Observed false-positive rate from the [[crossCorpusExactDedupBloom]]
    * telemetry pair: the share of NON-dup probes the bloom filter passed to
    * verification. 0.0 when every probe was a real dup (no false-positive
    * material). Compare against the filter's BUILT fpp — drift above it
    * means the filter has filled past its sizing ([[extendFingerprintBloom]]
    * ingests) and should be rebuilt.
    */
  def observedFpp(saturation: Map[String, Any], verification: Map[String, Any]): Double = {
    val probed = saturation("n_probed").asInstanceOf[Long]
    val cand = saturation("n_candidates").asInstanceOf[Long]
    val verified = verification("n_verified").asInstanceOf[Long]
    val trueNeg = probed - verified
    if (trueNeg <= 0L) 0.0 else (cand - verified).toDouble / trueNeg
  }

  /** [[crossCorpusExactDedupBloom]] with the "rebuild when drift" rule
    * EXECUTING ITSELF: runs the probe with fresh telemetry, evaluates
    * [[observedFpp]], and RAISES when it crosses `maxObservedFpp` — the
    * recurring-ingest loop fails loudly the run the filter outlives its
    * sizing, instead of silently widening the verification semi-join
    * forever while a human is supposed to be watching a number.
    *
    * `maxObservedFpp` should sit comfortably above the BUILT fpp (e.g.
    * 3–5× — observed fpp has sampling noise of order √(fpp/n_probed), so
    * small probe batches need headroom). On raise: rebuild via
    * [[buildFingerprintBloom]] sized for the corpus's CURRENT cardinality
    * and retry the ingest; the exception message carries both numbers.
    *
    * EAGER by design: the flags are persisted and counted so the
    * observations are bound before the check — the recurring-ingest
    * caller consumes the flags next anyway. Returns (flags — cached;
    * unpersist when done, observed fpp).
    */
  def crossCorpusExactDedupBloomChecked(newDocs: DataFrame, refDocs: DataFrame,
                                        filterBytes: Array[Byte],
                                        maxObservedFpp: Double,
                                        textCol: String = "text"): (DataFrame, Double) = {
    require(maxObservedFpp > 0.0 && maxObservedFpp < 1.0,
      s"maxObservedFpp must be in (0,1): $maxObservedFpp")
    val sat = Observation()
    val ver = Observation()
    val flags = crossCorpusExactDedupBloom(newDocs, refDocs, filterBytes,
      textCol, Some(sat), Some(ver))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    flags.count()
    val f = observedFpp(sat.get, ver.get)
    if (f > maxObservedFpp) {
      flags.unpersist()
      throw new IllegalStateException(
        f"bloom reference filter fpp drift: observed $f%.6f > allowed $maxObservedFpp%.6f " +
          "— the filter has filled past its sizing (extendFingerprintBloom ingests); " +
          "rebuild with buildFingerprintBloom at the corpus's current cardinality and retry")
    }
    (flags, f)
  }

  /** Embedding-cosine near-dup pairs within a blocking key (label / LSH
    * bucket): equi-join on the block, exact cosine on candidates.
    */
  def embeddingNearDup(emb: DataFrame, blockCol: String = "label",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       threshold: Double = 0.9): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(blockCol).as("__block"), col(vecCol).as("__v"))
    val a = e.as("a"); val b = e.as("b")
    a.join(b, col("a.__block") === col("b.__block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(vec_cosine(col("a.__v"), col("b.__v")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Semantic benchmark decontamination: flag corpus items whose embedding
    * is too close to ANY eval-set embedding (max cosine ≥ threshold) — the
    * embedding-space complement of the n-gram
    * [[TextAnalysis.decontaminate]]: n-gram collision misses paraphrased
    * eval leakage; cosine catches it. Same scale discipline as the n-gram
    * side: the EVAL set (a fixed benchmark — bounded by construction) is
    * BROADCAST; the corpus is scanned once, each row scored against the
    * broadcast rows by the codegen cosine kernel, and the one exchange is
    * the map-side-combined per-id max — one row per corpus item. The
    * corpus is never self-joined and never shuffled by anything
    * eval-sized.
    */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                            threshold: Double = 0.95,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ev = broadcast(evalSet.select(col(vecCol).as("__ev")))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(ev)
      .select(col(idCol), round(vec_cosine(col(vecCol), col("__ev")), 6).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= threshold)
  }

  /** ANN-accelerated semantic decontamination — the 100 TB path for
    * [[semanticDecontaminate]]'s O(N·E) kernel sweep: route the EVAL rows
    * as probes through the same deterministic IVF clustering the ANN
    * family uses. Each eval row selects its `nProbe` nearest cells
    * (driver-side centroid table, one kernel projection); a corpus item is
    * scored ONLY against eval rows probing its cell, so the kernel work
    * drops from N·E to Σ_{probed cells} |cell|·|probes(cell)| — at
    * nCells ≈ √N and a benchmark-sized eval set that is ~E·N/nCells·nProbe
    * ≪ N·E, and items in unprobed cells are never touched by a cosine at
    * all. `nProbe = nCells` degenerates to the exact semantics (parity
    * pinned by spec); smaller nProbe trades recall for cost exactly like
    * every other IVF search here.
    *
    * Plan shape: one kernel-projection scan (cell assignment), one
    * BROADCAST of the eval probe-cell table (eval sets are bounded by
    * construction — a fixed benchmark suite), one map-side-combined
    * per-(id, cell) max. The corpus is never self-joined, never shuffled
    * by anything eval-sized, and the single exchange carries one row per
    * corpus item (the left join keeps unprobed items with a NULL max —
    * `contaminated` coalesces to false, the honest "not checked ≈ not
    * close" ANN posture).
    *
    * Output: (idCol, cell, max_cos — null when no eval probe reached the
    * item's cell, contaminated).
    */
  def semanticDecontaminateAnn(corpus: DataFrame, evalSet: DataFrame,
                               threshold: Double = 0.95,
                               nCells: Int = 16, nProbe: Int = 4,
                               idCol: String = "vec_id", vecCol: String = "embedding",
                               lloydIters: Int = 0): DataFrame = {
    val (assigned, centroids) = graft.ops.SimilaritySearch.ivfAssign(
      corpus, nCells, itemId = idCol, itemVec = vecCol, lloydIters = lloydIters)
    val (cvs, cids) = graft.ops.SimilaritySearch.collectCentroids(centroids)
    val probeCells = evalSet
      .select(explode(nearest_cells(col(vecCol), cvs, cids, nProbe)).as("cell"),
        col(vecCol).as("__ev"))
    assigned.select(col(idCol), col("cell").cast("long").as("cell"), col(vecCol))
      .join(broadcast(probeCells.withColumn("cell", col("cell").cast("long"))),
        Seq("cell"), "left")
      .select(col(idCol), col("cell"),
        round(vec_cosine(col(vecCol), col("__ev")), 6).as("__c"))
      .groupBy(col(idCol), col("cell"))
      .agg(max(col("__c")).as("max_cos"))
      .withColumn("contaminated", coalesce(col("max_cos") >= threshold, lit(false)))
  }

  /** Embedding near-dup when NO natural blocking attribute exists — the
    * content-derived scale path: block by the random-hyperplane LSH bucket
    * of the vector itself ([[SimilaritySearch.lshBucket]], the same md5
    * hyperplanes the ANN index uses), candidate pairs under the same capped
    * hot-bucket discipline as the text LSH ([[cappedBucketPairs]] — dense
    * embedding regions degrade to compare-to-representative, linear per
    * bucket), exact cosine verification on candidates only. One band (the
    * bucket is a pure function of the vector), so a pair can collide at
    * most once per rotation. Recall is bucket-local by construction —
    * near-identical vectors land in the same bucket; raise `bits` for finer
    * blocks, or raise `rotations` for recall: each rotation hashes against
    * an INDEPENDENT hyperplane set (planes r·bits…) and contributes its own
    * band of buckets — a pair near-missed by one rotation's cut gets
    * another chance in the next (the vector analog of MinHash banding;
    * P[blocked together] = 1-(1-p)^r for per-rotation collision p).
    * Cross-rotation duplicate candidates collapse in [[cappedBucketPairs]].
    *
    * `bits <= 0` selects [[SimilaritySearch.autoBits]] (≈ log₂(N / cap),
    * the hyperplane analog of the IVF √N heuristic): a FIXED bits keeps
    * recall only at the corpus size it was tuned for — at 1000× the data
    * every bucket saturates `hotBucketCap` and each vector is paired with
    * the same capped representative set, a silent recall floor (measured
    * in SCALING.md). Auto-sizing grows the bucket count with the corpus so
    * expected occupancy stays ≈ cap. One count job, like `autoCells`.
    * Pass `saturation` to observe how many buckets still overflowed.
    *
    * `subBucket = true` adds two-level all-pairs INSIDE saturated buckets
    * (see [[cappedBucketPairs]]): member↔member pairs the star pairing
    * drops come back at a bounded B·cap/2 per-bucket cost — the knob that
    * lifts WITHIN-corpus pair recall under saturation (the star already
    * preserves cluster recall via transitivity).
    */
  def embeddingNearDupLsh(emb: DataFrame, dims: Int, bits: Int = 8,
                          threshold: Double = 0.9,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          hotBucketCap: Int = 64, rotations: Int = 1,
                          saturation: Option[Observation] = None,
                          subBucket: Boolean = false): DataFrame = {
    require(rotations >= 1, s"need >= 1 rotation, got $rotations")
    val b = if (bits > 0) bits
            else graft.ops.SimilaritySearch.autoBits(emb.count(), hotBucketCap)
    val buckets = (0 until rotations).map { r =>
      emb.select(col(idCol).as("doc_id"), lit(r).as("band"),
        graft.ops.SimilaritySearch.lshBucket(col(vecCol), dims, b,
          planeOffset = r * b).as("bucket"))
    }.reduce(_.unionByName(_))
    val cand = cappedBucketPairs(buckets, hotBucketCap, saturation, subBucket)
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(vec_cosine(col("__va"), col("__vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Cross-corpus SEMANTIC dedup: flag NEW-corpus embeddings whose cosine
    * to ANY reference embedding reaches `threshold` — the embedding twin of
    * [[crossCorpusDedup]] (dedup this dump's vectors against every prior
    * dump) and the cross-corpus cell of the near-dup family matrix
    * (text×within = [[minhashLsh]], text×cross = [[crossCorpusDedup]],
    * embedding×within = [[embeddingNearDupLsh]], embedding×cross = this).
    *
    * Both sides are corpus-scale, so neither is broadcast (that posture is
    * [[semanticDecontaminate]]'s, where the eval side is benchmark-sized):
    * both sides bucket by the shared random-hyperplane LSH
    * ([[graft.ops.SimilaritySearch.lshBucket]], `rotations` independent
    * bands for recall), the REFERENCE side of each (band, bucket) is
    * capped to the `hotRefCap` smallest ids (rank ≤ cap compiles to
    * WindowGroupLimit — bounded per-task state, deterministic
    * representatives), candidates are (new, ref) pairs only — never
    * ref×ref — and exact cosine verifies. Returns one row per NEW item:
    * `n_ref_candidates` (counted post-`distinct`, i.e. band-collapsed
    * (new, ref) pairs, not per-band collisions), `max_cos` (0.0 when no
    * candidates), and `dup = max_cos >= threshold`.
    *
    * `bits <= 0` selects [[SimilaritySearch.autoBits]] over the REFERENCE
    * corpus size (the side the cap truncates): fixed bits=8 is 256 buckets
    * per band forever, so at 2M ref vectors every bucket saturates
    * `hotRefCap` and each new vector is verified against the same
    * cap×rotations representatives — a silent recall floor (SCALING.md
    * documents the 1000× row). Auto-sizing keeps expected ref occupancy
    * ≈ cap as the reference corpus grows across dumps. Pass `saturation`
    * (fresh Observation per run) for `saturated_buckets`/`dropped_refs`
    * counts; note telemetry computes the full rank (the rank-limit
    * pushdown, WindowGroupLimit, cannot skip past the metrics node), so
    * leave it None on runs where the pinned capped plan matters more than
    * visibility.
    */
  def crossCorpusNearDupEmbedding(newEmb: DataFrame, refEmb: DataFrame,
                                  dims: Int, bits: Int = 8,
                                  threshold: Double = 0.9,
                                  idCol: String = "vec_id", vecCol: String = "embedding",
                                  hotRefCap: Int = 64, rotations: Int = 1,
                                  saturation: Option[Observation] = None): DataFrame = {
    require(rotations >= 1, s"need >= 1 rotation, got $rotations")
    require(hotRefCap > 0, s"hotRefCap must be positive: $hotRefCap")
    val b = if (bits > 0) bits
            else graft.ops.SimilaritySearch.autoBits(refEmb.count(), hotRefCap)
    def buckets(df: DataFrame) = (0 until rotations).map { r =>
      df.select(col(idCol).as("doc_id"), lit(r).as("band"),
        graft.ops.SimilaritySearch.lshBucket(col(vecCol), dims, b,
          planeOffset = r * b).as("bucket"))
    }.reduce(_.unionByName(_))
    val w = Window.partitionBy("band", "bucket").orderBy(col("doc_id").asc)
    val rbRanked = buckets(refEmb).withColumn("__rn", row_number().over(w))
    val rbObserved = saturation.fold(rbRanked)(obs => rbRanked.observe(obs,
      coalesce(sum(when(col("__rn") === hotRefCap + 1, lit(1L))), lit(0L))
        .as("saturated_buckets"),
      coalesce(sum(when(col("__rn") > hotRefCap, lit(1L))), lit(0L))
        .as("dropped_refs")))
    val rbCapped = rbObserved
      .filter(col("__rn") <= hotRefCap)
      .select(col("doc_id").as("ref_id"), col("band"), col("bucket"))
    val cand = buckets(newEmb).join(rbCapped, Seq("band", "bucket"))
      .select(col("doc_id"), col("ref_id")).distinct()
    val vn = newEmb.select(col(idCol).as("doc_id"), col(vecCol).as("__va"))
    val vr = refEmb.select(col(idCol).as("ref_id"), col(vecCol).as("__vb"))
    val agg = cand.join(vn, Seq("doc_id")).join(vr, Seq("ref_id"))
      .select(col("doc_id"), round(vec_cosine(col("__va"), col("__vb")), 6).as("__c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ref_candidates"), max("__c").as("max_cos"))
    newEmb.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ref_candidates"), lit(0L)).as("n_ref_candidates"),
        coalesce(col("max_cos"), lit(0.0)).as("max_cos"))
      .withColumn("dup", col("max_cos") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-based SEMANTIC
    * corpus dedup, the method used on LAION/LLM-scale corpora — k-means
    * cluster the embeddings (the SAME deterministic IVF assignment the ANN
    * family uses, so one clustering can serve both), then within each
    * cluster drop every item whose cosine to ANY lower-id cluster-mate is
    * ≥ `threshold` (the paper's upper-triangular-matrix rule: item i drops
    * iff max_{j<i} sim(i,j) > ε, independent of whether j itself dropped).
    * Keep-choice ordering is ascending id — the engine-wide first-wins
    * dedup convention; the paper keeps the member FARTHEST from the
    * centroid, an ordering detail (documented divergence).
    *
    * Scale: candidate pairs come from [[cappedBucketPairs]] over the cell
    * assignment — small cells do all-pairs, hot cells (> hotCellCap)
    * compare members against the cell's min-id representative only, so the
    * pair count is O(Σ min(cell, cap)·cell), never Σ cell². The paper runs
    * with cells of ~12k on 600M items — cap-free all-pairs within a cell
    * is its own posture; the cap is this engine's hot-key guard, same as
    * every other dedup family here.
    *
    * Output: one row per item — (idCol, cell, n_dup_prev, kept).
    */
  def semDedup(emb: DataFrame, nCells: Int = 16, threshold: Double = 0.9,
               idCol: String = "vec_id", vecCol: String = "embedding",
               lloydIters: Int = 0, hotCellCap: Int = 64,
               saturation: Option[Observation] = None): DataFrame = {
    val (assigned, _) = graft.ops.SimilaritySearch.ivfAssign(emb, nCells,
      itemId = idCol, itemVec = vecCol, lloydIters = lloydIters)
    val buckets = assigned.select(col(idCol).as("doc_id"),
      lit(0L).as("band"), col("cell").cast("long").as("bucket"))
    val cand = cappedBucketPairs(buckets, hotCellCap, saturation)
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val drops = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .filter(round(vec_cosine(col("__va"), col("__vb")), 6) >= threshold)
      .groupBy(col("id_b").as(idCol))
      .agg(count(lit(1)).as("n_dup_prev"))
    assigned.select(col(idCol), col("cell").cast("long").as("cell"))
      .join(drops, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("n_dup_prev"), lit(0L)).as("n_dup_prev"),
        (coalesce(col("n_dup_prev"), lit(0L)) === 0).cast("int").as("kept"))
  }

  /** Sub-document (segment-level) corpus dedup — the C4 rule ("discard any
    * repeated three-sentence span, keeping one occurrence", Raffel et al.
    * 2020 §2.2; RefinedWeb/Gopher do the same at line level) re-expressed
    * over fixed `segWords`-word segments so it applies to text without
    * sentence/line structure. Each document is cut into consecutive
    * non-overlapping word windows; for every distinct segment the corpus-wide
    * FIRST instance (minimal (doc_id, pos)) survives and every other instance
    * is dropped; surviving segments reassemble in document order.
    *
    * Plan shape: one token-kernel scan → per-segment rows (n/segWords rows
    * per doc, not per-token) → the min-instance resolution is a WINDOW min
    * over the segment digest (one digest-keyed exchange marking keepers in
    * place — a groupBy + join-back would materialize the tokenize+explode
    * subtree on both sides) → ONE groupBy(doc) computes segment counts and
    * the order-restoring sort_array reassembly together. Nothing is ever
    * all-pairs; the corpus is scanned once and the segment text crosses
    * exactly two exchanges (digest window, doc rebuild).
    *
    * Returns one row per input doc: (doc_id, n_segments, n_kept, clean_text)
    * — clean_text is "" when every segment of the doc was a repeat.
    */
  def segmentDedup(docs: DataFrame, segWords: Int = 10,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(segWords >= 1, s"segWords must be >= 1: $segWords")
    val toks = docs.select(col(idCol), word_tokens(col(textCol)).as("w"))
    // consecutive non-overlapping windows; the final partial window is a
    // segment too (same rule in the oracle). slice is 1-based.
    val segs = toks
      .filter(size(col("w")) >= 1)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), ((size(col("w")) - 1) / segWords).cast("int")),
          i => concat_ws(" ", slice(col("w"), i * segWords + 1, lit(segWords))))))
      .select(col(idCol), col("pos"), md5(col("col")).as("seg_hash"), col("col").as("seg"))
    // corpus-wide first instance per digest as a WINDOW min over the
    // (doc, pos) pair — the previous groupBy-on-digest + join-back +
    // separate n_segments groupBy evaluated the tokenize+explode `segs`
    // subtree THREE times (r13 plan audit, same finding as the media
    // dedups). One digest-keyed exchange marks keepers in place; ONE
    // groupBy(doc) then computes n_segments, n_kept and the reassembled
    // text together (collect_list skips the nulls the `when` leaves on
    // dropped segments). The corpus is scanned once.
    val w = Window.partitionBy("seg_hash")
    val marked = segs
      .withColumn("__first", min(struct(col(idCol).as("d"), col("pos").as("p"))).over(w))
      .withColumn("__keep", col("__first.d") === col(idCol) && col("__first.p") === col("pos"))
    marked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        // order restore without a second window: sort kept (pos, seg)
        // structs, then strip
        concat_ws(" ", transform(sort_array(collect_list(
          when(col("__keep"), struct(col("pos"), col("seg"))))),
          s => s.getField("seg"))).as("clean_text"))
      .select(col(idCol), col("n_segments"), col("n_kept"), col("clean_text"))
  }

  /** Exact SUBSTRING dedup — the repeated-span rule of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better"): any
    * word span of ≥ `windowWords` tokens that occurs more than once in the
    * corpus keeps only its FIRST occurrence (min (doc_id, pos)); every
    * other occurrence is cut out of its document, words outside the span
    * survive. Stronger than [[segmentDedup]]'s fixed non-overlapping
    * windows: stride-1 windows detect spans at ANY alignment, and runs of
    * duplicated windows merge into MAXIMAL spans before removal.
    *
    * Their suffix array is a single in-memory structure over the corpus;
    * the distributed re-expression is windowed hashing:
    *  1. one compiled-kernel pass emits the hex60 hash of every stride-1
    *     `windowWords`-window ([[graft.functions.textkernel.positional_shingle_hashes]]);
    *  2. ONE map-side-combined groupBy on the window hash finds duplicated
    *     windows and their corpus-wide first instance — the shuffle
    *     carries one row per distinct window per partition (8 B hashes,
    *     never window text);
    *  3. every non-canonical instance of a duplicated window marks its
    *     start position; per doc, runs of marked positions merge into
    *     maximal spans via the islands trick (pos − rank over the MARKED
    *     positions only — a per-doc window bounded by the doc's own
    *     duplicated-window count, not the corpus);
    *  4. covered token positions explode from the spans (bounded by
    *     removed-token count) and anti-join the token stream; survivors
    *     reassemble with sort_array — no corpus-wide window anywhere.
    *
    * Returns (doc_id, n_tokens, n_removed, clean_text). Documents shorter
    * than `windowWords` have no windows and pass through whole.
    */
  def spanDedup(docs: DataFrame, windowWords: Int = 20,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(windowWords >= 2, s"windowWords must be >= 2: $windowWords")
    // r13 rewrite (same plan audit as segmentDedup/mediaDedup): the
    // groupBy-on-hash + join-back + token-explode + anti-join form evaluated
    // the tokenize/shingle kernel subtree FOUR times and shuffled one row
    // per corpus TOKEN through the covered/anti-join exchanges. Now the
    // hash path alone (8 B rows) finds the spans, and removal happens
    // in-row via the remove_spans kernel at a single doc-keyed join.
    val wins = docs
      .select(col(idCol), posexplode(positional_shingle_hashes(col(textCol), windowWords)))
      .select(col(idCol), col("pos"), col("col").as("win_hash"))
    // duplicated windows + corpus-wide first instance: ONE window over the
    // hash marks every non-canonical instance in place (no join-back, no
    // kernel re-scan); hot hashes co-locate only 16-byte (id, pos) rows
    val hw = Window.partitionBy("win_hash")
    val marked = wins
      .withColumn("__n", count(lit(1)).over(hw))
      .withColumn("__first", min(struct(col(idCol).as("d"), col("pos").as("p"))).over(hw))
      .filter(col("__n") > 1 &&
        !(col("__first.d") === col(idCol) && col("__first.p") === col("pos")))
      .select(col(idCol), col("pos"))
    cutMarkedSpans(docs, marked, windowWords, textCol, idCol)
  }

  /** Reference-side span filter for [[crossCorpusSpanDedup]]: a Bloom
    * filter over the reference corpus's stride-1 window hashes (string
    * form — the [[graft.functions.textkernel.bloom_might_contain]] probe
    * is string-keyed), built once per reference generation and persisted
    * via [[writeBloomFilter]] like the fingerprint filter. Size
    * `expectedItems` for the reference's TOKEN count (one window per
    * token position), not its doc count.
    */
  def buildSpanBloom(refDocs: DataFrame, windowWords: Int = 20,
                     textCol: String = "text",
                     expectedItems: Long = 1L << 24,
                     fpp: Double = 0.01): Array[Byte] = {
    val bf = refDocs
      .select(explode(positional_shingle_hashes(col(textCol), windowWords)).as("h"))
      .select(col("h").cast("string").as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** CROSS-CORPUS exact substring dedup — [[spanDedup]]'s Lee et al. 2021
    * repeated-span rule pointed at a REFERENCE corpus: any ≥ `windowWords`
    * word span of a NEW document that also occurs anywhere in the
    * reference is cut from the new document (the reference is canonical —
    * its own text is never touched and never self-compared). This is the
    * actual Lee et al. deployment shape (dedup dump N+1 against dumps
    * 1..N at substring granularity) and catches what the doc-level
    * [[crossCorpusDedup]] family provably misses: a copied span at a
    * DIFFERENT OFFSET inside otherwise-novel text leaves document
    * fingerprints, minhash signatures and embeddings all far apart while
    * the span itself is verbatim training leakage.
    *
    * Scale shape (the [[spanDedup]] machinery, re-pointed):
    *  - the reference side collapses to DISTINCT window hashes (8 B rows,
    *    map-side combined — never window text, never ref×ref pairs);
    *  - the new side's (id, pos, hash) rows semi-join that set on the
    *    hash — with `refFilterBytes` (from [[buildSpanBloom]]) the rows
    *    are bloom-probed at scan speed first, so only true matches plus
    *    the fpp share enter the exchange (the
    *    [[crossCorpusExactDedupBloom]] recurring-ingest posture; output
    *    stays EXACT — probe survivors are verified by the semi-join);
    *  - marked positions merge into maximal spans and are cut in-row
    *    ([[cutMarkedSpans]]): the new corpus's text crosses exactly ONE
    *    exchange, the reference's text crosses none.
    *
    * Returns (idCol, n_tokens, n_removed, clean_text) for NEW docs only.
    */
  def crossCorpusSpanDedup(newDocs: DataFrame, refDocs: DataFrame,
                           windowWords: Int = 20, textCol: String = "text",
                           idCol: String = "doc_id",
                           refFilterBytes: Option[Array[Byte]] = None): DataFrame = {
    require(windowWords >= 2, s"windowWords must be >= 2: $windowWords")
    val newWins = newDocs
      .select(col(idCol), posexplode(positional_shingle_hashes(col(textCol), windowWords)))
      .select(col(idCol), col("pos"), col("col").as("win_hash"))
    val probed = refFilterBytes.fold(newWins) { fb =>
      newWins.filter(bloom_might_contain(col("win_hash").cast("string"), fb))
    }
    val refWins = refDocs
      .select(explode(positional_shingle_hashes(col(textCol), windowWords)).as("win_hash"))
      .distinct()
    val marked = probed.join(refWins, Seq("win_hash"), "left_semi")
      .select(col(idCol), col("pos"))
    cutMarkedSpans(newDocs, marked, windowWords, textCol, idCol)
  }

  /** Shared tail of [[spanDedup]] and
    * [[TextAnalysis.decontaminateSpans]]: merge marked window-START
    * positions into maximal spans and cut them from the documents.
    *
    * islands: consecutive marked positions share (pos - rank); spans are
    * [min, max + W - 1] per island — islands closer than W yield
    * OVERLAPPING spans, merged inside the remove_spans kernel. The corpus
    * text crosses exactly ONE exchange (the doc-keyed span attach; the
    * span side arrives already id-partitioned from the islands window).
    * Returns (idCol, n_tokens, n_removed, clean_text).
    */
  private[ops] def cutMarkedSpans(docs: DataFrame, marked: DataFrame,
                                  windowWords: Int, textCol: String,
                                  idCol: String): DataFrame = {
    val isl = marked.withColumn("g",
      col("pos") - row_number().over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
    val spans = isl.groupBy(col(idCol), col("g"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + windowWords - 1).as("e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("__spans"))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol), remove_spans(col(textCol),
        coalesce(col("__spans"),
          array().cast("array<struct<s:int,e:int>>"))).as("r"))
      .select(col(idCol), col("r.n_tokens").as("n_tokens"),
        (col("r.n_tokens") - col("r.n_kept")).as("n_removed"),
        col("r.clean_text").as("clean_text"))
  }
}
