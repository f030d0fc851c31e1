package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.textfn._

/** Deterministic sampling/splitting for training-data assembly. Every draw
  * is a pure function of (salt, id) via md5 — stable across runs, engines,
  * partitionings, and corpus growth: a document's split/sample membership
  * NEVER changes when other documents arrive, unlike `randomSplit`/
  * `sample`, which re-deal on any partitioning change. All per-row
  * projections/filters — no shuffle, scan-speed at any scale.
  */
object Sampling {

  private val Hex60Range = (1L << 60).toDouble

  /** Uniform draw u(id) in [0,1): 60-bit md5 hash of "salt:id" over 2^60.
    * SQL twin: CAST('0x' || substr(md5('salt:' || id), 1, 15) AS BIGINT) /
    * 1152921504606846976.0
    */
  private def draw(idCol: Column, salt: String): Column =
    hexhash60(concat(lit(s"$salt:"), idCol.cast("string"))) / lit(Hex60Range)

  /** Train/val/test assignment: the id's draw falls into the cumulative-
    * weight interval of a split. Weights that are exact in binary (0.75,
    * 0.125, …) give bit-identical cut points across engines; arbitrary
    * weights are fine operationally (the ~1-ulp cut fuzz moves a ~1e-17
    * sliver of draws).
    */
  def splitAssign(df: DataFrame, splits: Seq[(String, Double)],
                  idCol: String = "doc_id", salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"positive split weights required: $splits")
    val total = splits.map(_._2).sum
    val cuts = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val u = draw(col(idCol), salt)
    val assigned = splits.zip(cuts).init
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), cut), acc) => when(u < lit(cut), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Deterministic Bernoulli sample: keep ids whose draw < fraction.
    * Different salts give independent samples; the same salt gives NESTED
    * samples (fraction 0.1 ⊂ fraction 0.2) — handy for scaling-law subsets.
    */
  def sampleFraction(df: DataFrame, fraction: Double,
                     idCol: String = "doc_id", salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    df.filter(draw(col(idCol), salt) < lit(fraction))
  }

  /** Stratified deterministic sample: per-group keep fractions over the SAME
    * per-id draw (groups share draws, so the nesting property holds across
    * strata too: raising one group's fraction only ADDS members). Groups not
    * in `fractions` keep `default` (drop by default — loud would reject
    * legitimate "sample only these sources" use). The standard corpus-mixing
    * move: downsample overrepresented languages/sources to a target mix
    * without a shuffle — still one scan, one per-row filter.
    */
  def stratifiedSample(df: DataFrame, fractions: Map[String, Double],
                       groupCol: String, default: Double = 0.0,
                       idCol: String = "doc_id", salt: String = "sample"): DataFrame = {
    require(fractions.nonEmpty && (fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions default=$default")
    // fold in sorted key order so the generated plan is deterministic
    val frac = fractions.toSeq.sortBy(_._1).foldRight(lit(default): Column) {
      case ((g, f), acc) => when(col(groupCol) === lit(g), lit(f)).otherwise(acc)
    }
    df.filter(draw(col(idCol), salt) < frac)
  }

  /** Deterministic weighted sampling WITHOUT replacement — Efraimidis &
    * Spirakis (2006): each row draws key = ln(u)/w for its uniform u and
    * weight w > 0; the k largest keys are exactly a weighted sample
    * without replacement (P[first pick = i] = wᵢ/Σw, then renormalized).
    * The textbook form is u^(1/w); ln(u)/w is the same ordering (ln is
    * monotone) without the pow. u = (hash+1)/2^60 ∈ (0,1] so ln is finite,
    * and the draw is the engine-wide md5 discipline — the sample is a pure
    * function of (salt, id, weight), reproducible on any cluster shape.
    *
    * Scale: top-k by key is TakeOrderedAndProject — a per-partition heap of
    * k rows then one k-row merge on the driver, NO global sort, no shuffle
    * of the corpus. The standard curation move this serves: pick a token
    * budget's worth of documents with probability ∝ quality/length weight.
    *
    * Rows with non-positive, null, or NaN weight are excluded (zero-weight
    * items are unsampleable by definition; negative/NaN is a caller bug
    * surfaced by the exclusion, not silently sampled — NaN needs its own
    * guard because Spark's total order puts NaN above every number, so
    * `NaN > 0` is true and a NaN key would sort FIRST under desc and
    * dominate the sample). Output: the k sampled rows with `sample_key`
    * (rounded for display; ordering used the full double).
    */
  def weightedSample(df: DataFrame, k: Int, weightCol: String,
                     idCol: String = "doc_id", salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (hexhash60(concat(lit(s"$salt:"), col(idCol).cast("string"))) + lit(1L)) /
      lit(Hex60Range)
    val key = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && !isnan(col(weightCol).cast("double")) &&
        col(weightCol) > 0)
      .withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .withColumn("sample_key", round(col("__key"), 6))
      .drop("__key")
  }

  /** LEAKAGE-FREE train/val/test assignment: a near-dup cluster's members
    * always land in the SAME split — the draw happens on the cluster id,
    * not the document id, so a paraphrase of a training document can never
    * leak into the test set through an independent draw (the classic
    * dedup-then-split methodology bug: splitting first puts near-dups on
    * both sides).
    *
    * `pairs` is any near-dup pair table (id_a, id_b) from the dedup family
    * ([[graft.ops.Dedup.minhashLsh]], [[graft.ops.Dedup.embeddingNearDupLsh]],
    * …); clusters resolve via [[graft.ops.Dedup.dupClusters]]. The cluster
    * table is O(pairs), and at web-scale near-dup rates (30–50%) that is
    * O(corpus) — so the join carries NO broadcast hint: AQE broadcasts it
    * when it is small and falls back to sort-merge when it is not, which is
    * exactly the regime `dupClusters` itself plans for (driver union-find
    * under `driverCap`, distributed pointer-doubling above it). Documents in
    * no pair are their own cluster, so their assignment is IDENTICAL to
    * [[splitAssign]] — adding pairs only ever moves clustered docs, and
    * membership stays stable under corpus growth like every other draw.
    *
    * Ids must be long-castable (the contract `dupClusters` already imposes);
    * a non-numeric id fails LOUDLY via `raise_error` instead of silently
    * collapsing to a NULL cluster draw. Output: input rows + (cluster_id,
    * split).
    */
  def leakageFreeSplit(df: DataFrame, pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       idCol: String = "doc_id", salt: String = "split",
                       driverCap: Long = 1_000_000L): DataFrame = {
    val clusters = graft.ops.Dedup.dupClusters(pairs, driverCap = driverCap)
      .withColumnRenamed("doc_id", idCol)
    val withCluster = df
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol).cast("long"),
        raise_error(concat(lit("leakageFreeSplit: non-long-castable doc id: "),
          col(idCol).cast("string"))).cast("long")))
    splitAssign(withCluster, splits, idCol = "cluster_id", salt = salt)
  }

  /** UniMax corpus budgeting (Chung et al. 2023, arXiv:2304.09151):
    * distribute a total document `budget` across groups (languages/sources)
    * as EVENLY as possible, except no group repeats more than `maxEpochs`
    * times — the fairer alternative to temperature sampling for mixing a
    * heavy-head corpus. Water-filling closed form over groups sorted by
    * cap = n·maxEpochs ascending: the k smallest groups are capped, the
    * rest share the remaining budget equally, where k is the count of
    * groups with cap·(m−rank) ≤ budget − Σcap≤rank (the multiplication
    * form — exact arithmetic when maxEpochs is binary-exact, so the SQL
    * twin agrees bit-for-bit; algebraically the greedy loop's test).
    *
    * Group stats are a bounded collect by construction (groups are
    * languages/sources — dozens, not corpus-sized); the corpus itself is
    * never collected or shuffled here. Returns one row per group:
    * (groupCol, n_docs, cap, quota, epochs) with quota/epochs rounded 6dp.
    */
  def unimaxQuotas(df: DataFrame, budget: Double, maxEpochs: Double,
                   groupCol: String = "lang"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect()
      .map { case (g, n) => (g, n, n * maxEpochs) }
      .sortBy { case (g, _, cap) => (cap, g) }
    val m = sizes.length
    val prefix = sizes.scanLeft(0.0)(_ + _._3) // S_0..S_m (inclusive at i+1)
    var k = 0
    while (k < m && sizes(k)._3 * (m - (k + 1)) <= budget - prefix(k + 1)) k += 1
    val share = if (k == m) 0.0 else (budget - prefix(k)) / (m - k)
    spark.createDataset(sizes.zipWithIndex.map { case ((g, n, cap), i) =>
      val quota = if (i < k) cap else share
      (g, n, cap, quota, quota / n)
    }.toSeq).toDF(groupCol, "n_docs", "cap", "quota", "epochs")
      .select(col(groupCol), col("n_docs"), col("cap"),
        round(col("quota"), 6).as("quota"), round(col("epochs"), 6).as("epochs"))
  }

  /** Per-document repeat counts realizing [[unimaxQuotas]]: every document
    * of a group with epochs e gets ⌊e⌋ copies plus one more iff its
    * deterministic draw falls under the fractional part — E[group total] =
    * quota exactly, membership stable under re-runs (md5-draw discipline).
    * One broadcast-joined quota table over one corpus scan; `n_copies` is
    * ready for the packing/mixture stages (0 = dropped).
    */
  def unimaxAssign(df: DataFrame, budget: Double, maxEpochs: Double,
                   groupCol: String = "lang", idCol: String = "doc_id",
                   salt: String = "unimax"): DataFrame =
    assignCopies(df, unimaxQuotas(df, budget, maxEpochs, groupCol),
      groupCol, idCol, salt)

  /** Temperature-scaled mixture quotas — the standard multilingual recipe
    * UniMax improves on (sample group l with p ∝ n_l^α; α = 1 is natural
    * proportion, α → 0 is uniform, mT5 used α = 0.3): quota_l =
    * budget · n_l^α / Σ n^α. No repeat cap — use [[unimaxQuotas]] when
    * over-epoching small groups matters.
    *
    * Determinism: n^α is computed as exp(α·ln n) in BOTH engines (pow is
    * not reliably identical across libms; exp/ln already carry the DSIR
    * and perplexity oracles) and immediately µ-quantized, so the weight
    * TOTAL is an exact long sum — order-free — and quota is two double
    * ops from it. Same bounded-collect posture as [[unimaxQuotas]].
    */
  def temperatureQuotas(df: DataFrame, budget: Double, alpha: Double,
                        groupCol: String = "lang"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect()
      .map { case (g, n) =>
        (g, n, BigDecimal(math.exp(alpha * math.log(n.toDouble)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
      .sortBy(_._1)
    val total = sizes.map(_._3).sum
    spark.createDataset(sizes.toSeq.map { case (g, n, wm) =>
      val quota = budget * wm / total
      (g, n, wm, quota, quota / n)
    }).toDF(groupCol, "n_docs", "w_micro", "quota", "epochs")
      .select(col(groupCol), col("n_docs"), col("w_micro"),
        round(col("quota"), 6).as("quota"), round(col("epochs"), 6).as("epochs"))
  }

  /** [[unimaxAssign]]'s realization for [[temperatureQuotas]]. */
  def temperatureAssign(df: DataFrame, budget: Double, alpha: Double,
                        groupCol: String = "lang", idCol: String = "doc_id",
                        salt: String = "tempmix"): DataFrame =
    assignCopies(df, temperatureQuotas(df, budget, alpha, groupCol),
      groupCol, idCol, salt)

  /** Shared realization tail: broadcast-join a (group, n_docs, quota)
    * table, emit ⌊epochs⌋ + fractional-draw copies per document.
    */
  private def assignCopies(df: DataFrame, quotas: DataFrame, groupCol: String,
                           idCol: String, salt: String): DataFrame = {
    // epochs from the UNROUNDED ratio of rounded quota to n — one division,
    // engine-identical; the 6dp quota is the published contract
    val epochs = col("quota") / col("n_docs").cast("double")
    df.join(broadcast(quotas.select(col(groupCol), col("n_docs"), col("quota"))),
        Seq(groupCol))
      .withColumn("__e", epochs)
      .withColumn("n_copies",
        (floor(col("__e")) + when(draw(col(idCol), salt) < col("__e") - floor(col("__e")),
          lit(1L)).otherwise(lit(0L))).cast("long"))
      .withColumn("epochs", round(col("__e"), 6))
      .drop("__e", "n_docs", "quota")
  }

  /** Stable pseudo-random training order: a `shuffle_key` column to sort or
    * range-partition by — the deterministic analog of shuffling the corpus
    * before sequence packing.
    */
  def shuffleOrder(df: DataFrame, idCol: String = "doc_id",
                   salt: String = "shuffle"): DataFrame =
    df.withColumn("shuffle_key",
      hexhash60(concat(lit(s"$salt:"), col(idCol).cast("string"))))
}
