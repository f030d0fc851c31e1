package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.MaterializeSyntax

/** Link-graph analytics over crawl edge lists ([[Html.extractLinks]] →
  * canonicalized (src, dst) pairs): PageRank as a corpus quality signal —
  * the classic centrality prior crawl pipelines mix into quality scoring
  * (Page et al. 1999; Common Crawl publishes exactly such rank files).
  *
  * Determinism: ranks are FIXED-POINT integers (micro-units of `scale`),
  * every step is integer arithmetic — contribution = rank div outdeg,
  * damping = (num·x) div den — so two engines cannot disagree by a ulp and
  * the DuckDB oracle replays iterations exactly. The rounding convention
  * (floor division, dangling mass dropped) is part of the operator spec;
  * ranking ORDER converges to real PageRank as scale grows.
  *
  * Scale shape: the textbook iterative join — each iteration is one
  * equi-join of edges to ranks plus a map-side-combined sum per dst (rank
  * state is 16 bytes/node; edges shuffle once per iteration on src/dst
  * keys, co-partitionable by pre-bucketing both on the node key). Lineage
  * grows per iteration: pass `checkpointEvery` to truncate on long runs
  * (production posture — iterative algorithms checkpoint); the default
  * keeps the plan lazy for small iteration counts.
  */
object LinkGraph {

  /** Anchor-text corpus: aggregate the anchor texts pointing AT each
    * canonical URL — the (document, query-like surrogate) training pairs
    * search models are built from (anchors describe the TARGET, so this
    * is the web's own labeling). One map-side-combined aggregation on the
    * canonical target whose per-group STATE is bounded by `maxAnchors`
    * ([[graft.functions.TopKAggregator.MinKDistinct]] — total inlink count
    * plus the maxAnchors lexicographically-least distinct anchors in a
    * capped buffer): a hub page with millions of DISTINCT anchor texts
    * costs maxAnchors strings of memory and shuffle, not
    * diversity-proportional collect_set state. Result is bit-identical to
    * the `(count(*), slice(array_sort(collect_set), 1, k))` formulation
    * this replaces (byte-wise UTF-8 ordering, pinned by LinkGraphSpec).
    */
  def anchorCorpus(links: DataFrame, hrefCol: String = "href",
                   anchorCol: String = "anchor",
                   maxAnchors: Int = 16): DataFrame = {
    val spark = links.sparkSession
    import spark.implicits._
    links
      .select(Urls.canonicalColumn(col(hrefCol)).as("url_canon"),
        col(anchorCol).as("__a"))
      .filter(col("url_canon").isNotNull && col("__a") =!= "")
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.TopKAggregator.minKDistinct(maxAnchors).name("__agg"))
      .select(col("key").as("url_canon"),
        col("__agg.n").as("n_inlinks"),
        col("__agg.items").as("anchors"))
  }

  /** Fixed-point-integer PageRank. Production shape:
    *
    *  - **Pre-bucketed co-partitioned iteration**: the adjacency
    *    (edges pre-joined with outdegree) is hash-repartitioned on `src`
    *    and PERSISTED once; the node table likewise on `node`. Each
    *    iteration's rank state leaves the previous iteration hash-
    *    partitioned on `node` (the aggregate/join output partitioning),
    *    which after the rename IS the `src` partitioning the adjacency
    *    join needs, and the contribution aggregate's output partitioning
    *    on `dst` IS the `node` partitioning the rank-update join needs —
    *    so the ONLY exchange per iteration is the map-side-combined
    *    contribution sum (≤ one row per distinct dst per task; rank rows,
    *    never edge rows). Pinned by PlanSpec. Edges are read, shuffled
    *    and cached exactly once for the whole run.
    *  - **Dangling mass**: by default dropped (floor-division spec, oracle
    *    replays exactly). `redistributeDangling = true` adds the classic
    *    uniform redistribution — each iteration the summed rank of
    *    out-degree-0 nodes is divided (integer `div`) by the node count
    *    and added to every node's incoming sum before damping; the
    *    dangling sum is a one-row broadcast, deterministic integer
    *    arithmetic end-to-end, replayed by the q_pagerank_dangling oracle.
    *  - **Cache lifecycle**: the adjacency/node tables are persisted for
    *    the run only. With `releaseCache = true` (default) the final ranks
    *    are materialized (`localCheckpoint`, cutting lineage) and all
    *    persisted inputs unpersisted before returning — repeated calls in
    *    a long-lived session never accumulate CacheManager entries. Pass
    *    `releaseCache = false` to get the lazy iterative plan back (plan
    *    inspection, or callers managing materialization themselves — the
    *    returned frame then pins adj/nodes until it is garbage-collected).
    */
  def pageRank(edges: DataFrame, iters: Int,
               srcCol: String = "src", dstCol: String = "dst",
               dampingNum: Long = 85, dampingDen: Long = 100,
               scale: Long = 1_000_000L,
               checkpointEvery: Int = 0,
               redistributeDangling: Boolean = false,
               releaseCache: Boolean = true): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    require(dampingNum >= 0 && dampingNum <= dampingDen, "damping must be in [0, 1]")
    // r19 (guide §2.4): repartition on src FIRST — hash clustering on src
    // co-locates every (src, dst) pair, so the dedup aggregation, the
    // outdegree aggregation AND the adjacency self-join all reuse this ONE
    // exchange (before: dedup keyed (src,dst), outdeg keyed src and a
    // final repartition each planned their own)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    // one-time bucketing: adjacency clustered by src, nodes by node — the
    // iteration reuses both cached partitionings on every join
    val adj = e.join(outdeg, "src").persist()
    // distinct() already hash-clusters on node — no re-repartition
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .persist()
    // dangling = nodes with no outgoing edge (never a src)
    lazy val dangling = nodes.join(
      outdeg.select(col("src").as("node")), Seq("node"), "left_anti").persist()
    lazy val nNodes = math.max(1L, nodes.count())
    val base = scale * (dampingDen - dampingNum) / dampingDen
    var ranks = nodes.withColumn("rank", lit(scale))
    var it = 1
    while (it <= iters) {
      val contribs = adj.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank div od").as("__c"))
      val sums = contribs.groupBy("dst").agg(sum("__c").as("__s"))
        .withColumnRenamed("dst", "node")
      val joined = nodes.join(sums, Seq("node"), "left")
      ranks =
        if (!redistributeDangling)
          joined.select(col("node"),
            (lit(base) + expr(s"($dampingNum * coalesce(__s, 0L)) div $dampingDen"))
              .as("rank"))
        else {
          val dm = ranks.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0L)).as("__dm"))
          joined.crossJoin(broadcast(dm))
            .select(col("node"),
              (lit(base) + expr(
                s"($dampingNum * (coalesce(__s, 0L) + __dm div $nNodes)) div $dampingDen"))
                .as("rank"))
        }
      // the dangling branch reads the PREVIOUS ranks twice per iteration
      // (contribution join + dangling-mass sum): without a per-iteration
      // lineage cut the dm subtree recomputes every earlier iteration —
      // O(iters²) work. Checkpoint each iteration (partitioning preserved,
      // so the exchange budget is unchanged); blocks are GC-reclaimed.
      // LAZY for all but the final iteration (r19): the next iteration's
      // first job materializes the cut anyway (the dm broadcast subtree
      // runs first and caches the blocks), so an eager per-iteration job
      // barrier only serialized the loop; the final cut stays eager so
      // releaseCache can unpersist the inputs with the result materialized.
      if (redistributeDangling)
        ranks = ranks.materialize(it == iters)
      else if (checkpointEvery > 0 && it % checkpointEvery == 0)
        ranks = ranks.materialize(it == iters)
      it += 1
    }
    if (releaseCache) {
      // eager materialization so the result no longer references the caches
      // — except when the loop's last step ALREADY checkpointed (dangling
      // path, or checkpointEvery landing on the final iteration): ranks is
      // then materialized and cache-free, and a second checkpoint would be
      // a pure extra pass over the result
      val alreadyCut = iters > 0 && (redistributeDangling ||
        (checkpointEvery > 0 && iters % checkpointEvery == 0))
      val out = if (alreadyCut) ranks else ranks.materialize(true)
      adj.unpersist()
      nodes.unpersist()
      if (redistributeDangling && iters > 0) dangling.unpersist()
      out
    } else ranks
  }
}
