package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def pageRank(edges: DataFrame, iters: Int,
               srcCol: String = "src", dstCol: String = "dst",
               dampingNum: Long = 85, dampingDen: Long = 100,
               scale: Long = 1_000_000L,
               checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    require(dampingNum >= 0 && dampingNum <= dampingDen, "damping must be in [0, 1]")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).dropDuplicates("src", "dst")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val base = scale * (dampingDen - dampingNum) / dampingDen
    var ranks = nodes.withColumn("rank", lit(scale))
    var it = 1
    while (it <= iters) {
      val contribs = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("rank div od").as("__c"))
      val sums = contribs.groupBy("dst").agg(sum("__c").as("__s"))
      ranks = nodes.join(sums.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingNum * coalesce(__s, 0L)) div $dampingDen"))
            .as("rank"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0)
        ranks = ranks.localCheckpoint()
      it += 1
    }
    ranks
  }
}
