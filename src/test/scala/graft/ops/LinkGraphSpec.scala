package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
                      checkpointEvery: Int = 0): Map[Long, Long] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), iters,
        checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-computed two-node exchange: one exact integer iteration") {
    // 1 -> 2, 2 -> 1, both outdeg 1: after one iteration each rank is
    // base + (85 * (1000000 div 1)) div 100 = 150000 + 850000 = 1000000
    val r1 = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 1)
    assert(r1 == Map(1L -> 1000000L, 2L -> 1000000L))
    // star 1->3, 2->3: node 3 receives two full contributions,
    // 150000 + (85 * 2000000) div 100 = 1850000; 1 and 2 receive none
    val r2 = ranksOf(Seq((1L, 3L), (2L, 3L)), iters = 1)
    assert(r2 == Map(1L -> 150000L, 2L -> 150000L, 3L -> 1850000L))
    // split outdeg: 1 -> {2, 3}: each gets 1000000 div 2
    val r3 = ranksOf(Seq((1L, 2L), (1L, 3L)), iters = 1)
    assert(r3(2L) == 150000L + 85L * 500000L / 100L)
    assert(r3(2L) == r3(3L))
  }

  test("hub centrality: the most-linked node ranks highest after iterations") {
    // 0..4 all link to 5; 5 links back to 0 only
    val edges = (0L to 4L).map(i => (i, 5L)) :+ ((5L, 0L))
    val r = ranksOf(edges, iters = 3)
    val top = r.maxBy(_._2)._1
    assert(top == 5L, r.toString)
    assert(r(0L) > r(1L), "the hub's sole target outranks plain sources")
  }

  test("duplicate edges collapse; checkpointed iterations are value-identical") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)) // duplicate must not double-count
    assert(ranksOf(edges, 2) == ranksOf(Seq((1L, 2L), (2L, 1L)), 2))
    assert(ranksOf(edges, 3) == ranksOf(edges, 3, checkpointEvery = 1))
  }

  test("dangling-mass redistribution: hand-computed iteration; default still drops") {
    // 1 -> 2; node 2 is dangling (no outlinks). scale 1e6, damping 85/100,
    // base 150000, nNodes 2.
    // iter 1 with redistribution: dm = rank(2) = 1000000, dm div 2 = 500000
    //   rank(1) = 150000 + 85*(0 + 500000) div 100      = 575000
    //   rank(2) = 150000 + 85*(1000000 + 500000) div 100 = 1425000
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = LinkGraph.pageRank(edges, 1, redistributeDangling = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 575000L, 2L -> 1425000L), r.toString)
    // default drops the dangling mass: node 1 gets base only
    val d = LinkGraph.pageRank(edges, 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(d == Map(1L -> 150000L, 2L -> 1000000L), d.toString)
    // with redistribution, total mass is conserved up to floor-division
    // residue: sum(ranks) stays within nNodes of the initial total
    val r3 = LinkGraph.pageRank(edges, 3, redistributeDangling = true)
      .collect().map(_.getLong(1)).sum
    assert(r3 <= 2000000L && r3 > 2000000L - 3 * 2 - 2 * 15000, r3.toString)
  }

  test("plan: equi-joins + partial aggregation, no cartesian") {
    val edges = (0L until 100L).map(i => (i, (i * 7 + 1) % 100)).toDF("src", "dst")
    val df = LinkGraph.pageRank(edges, iters = 2, releaseCache = false)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("anchorCorpus: bounded aggregation state, bit-identical to the collect_set form") {
    // one hub target with 100k DISTINCT anchors (the diversity blow-up
    // case) + one normal target with few anchors incl. duplicates and a
    // UTF-8-vs-UTF-16 ordering probe (U+1F600 is F0.. in UTF-8 — sorts
    // AFTER U+FFFD's EF.. bytes, but BEFORE it by Java compareTo)
    val hub = spark.range(100000).select(
      lit("http://hub.com/x").as("href"),
      concat(lit("anchor "), format_string("%06d", col("id"))).as("anchor"))
    val small = Seq(
      ("http://s.com/a", "zeta"), ("http://s.com/a", "zeta"),
      ("http://s.com/a", "😀"), ("http://s.com/a", "�"),
      ("http://s.com/a", "alpha")).toDF("href", "anchor")
    val links = hub.unionByName(small)
    val out = LinkGraph.anchorCorpus(links, maxAnchors = 16)
    // per-group state is the capped typed buffer: no collect_set anywhere
    // in the plan, and the shuffle carries <= 16 anchors per group
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    val r = out.collect().map(x =>
      x.getString(0) -> ((x.getLong(1), x.getSeq[String](2)))).toMap
    assert(r("http://hub.com/x")._1 == 100000L)
    assert(r("http://hub.com/x")._2 == (0 until 16).map(i => f"anchor $i%06d"))
    // bit-identical to the unbounded collect_set formulation it replaced
    val legacy = links
      .select(Urls.canonicalColumn(col("href")).as("url_canon"), col("anchor").as("__a"))
      .filter(col("url_canon").isNotNull && col("__a") =!= "")
      .groupBy("url_canon")
      .agg(count(lit(1)).as("n_inlinks"),
        slice(array_sort(collect_set(col("__a"))), 1, 16).as("anchors"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getSeq[String](2)))).toMap
    assert(r == legacy)
    assert(r("http://s.com/a")._2 == Seq("alpha", "zeta", "�", "😀"))
  }

  test("pageRank releases its caches by default: no CacheManager residue per call") {
    // r10 advice: adj/nodes/dangling were persisted and never unpersisted —
    // every pageRank call in a long-lived session pinned CacheManager
    // entries forever. Default posture now: materialize (lineage cut) +
    // unpersist before returning; values identical to the lazy plan.
    val edges = (0L until 60L).map(i => (i, (i * 7 + 1) % 60)).toDF("src", "dst")
    val cm = spark.sharedState.cacheManager
    cm.clearCache() // deterministic baseline (caches are perf-only)
    val released = LinkGraph.pageRank(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cm.isEmpty, "pageRank left persisted frames in the CacheManager")
    val redis = LinkGraph.pageRank(edges, 2, redistributeDangling = true).collect()
    assert(redis.nonEmpty && cm.isEmpty,
      "redistributeDangling path left persisted frames in the CacheManager")
    val lazyRanks = LinkGraph.pageRank(edges, 2, releaseCache = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(released == lazyRanks)
    cm.clearCache() // release the lazy variant's pins
  }

  test("anchorCorpus with maxAnchors = 0 matches the legacy empty-slice contract") {
    // r10 advice: MinKDistinct.insert hit Nil.last for k <= 0; the legacy
    // slice(array_sort(collect_set), 1, 0) returned an empty array. Counts
    // still accumulate; the item buffer stays empty.
    val links = Seq(("http://s.com/a", "x"), ("http://s.com/a", "y"))
      .toDF("href", "anchor")
    val r = LinkGraph.anchorCorpus(links, maxAnchors = 0).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L && r(0).getSeq[String](2).isEmpty)
  }

  test("extractLinks golden: positional alignment, messy whitespace, inner markup") {
    val docs = Seq(
      (1L, "<p><a href=\"http://a.com/1\">one</a> <a class=\"z\" href=\"http://b.com\">two\n words</a></p>"),
      (2L, "no links here"),
      (3L, "<a href=\"/rel\"><b>bold</b></a>"))
      .toDF("doc_id", "html")
    val out = Html.extractLinks(docs).orderBy("doc_id", "link_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, "http://a.com/1", "one"),
      (1L, 1L, "http://b.com", "two words"),
      (3L, 0L, "/rel", "<b>bold</b>")))
    val p = Html.extractLinks(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("extractMediaRefs golden: four media tags, case folding, src-less skipped") {
    val docs = Seq(
      (1L, "<IMG src=\"http://i.co/a.png\"> <img alt=\"none\"> " +
        "<video poster=\"p.jpg\" src=\"http://v.co/b.mp4\"><source src=\"http://v.co/b.webm\"></video>"),
      (2L, "plain text, no media"),
      (3L, "<audio controls src=\"http://a.co/c.mp3\"></audio>"),
      // lazy-loading markup: attributes that merely END in src must not be
      // extracted as fetchable references (the [\s"'] delimiter in MediaRe)
      (4L, "<img data-src=\"lazy.png\" class=\"ll\"> <video poster-src=\"p2.jpg\"></video>"))
      .toDF("doc_id", "html")
    val out = Html.extractMediaRefs(docs).orderBy("doc_id", "media_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, "img", "http://i.co/a.png"),
      (1L, 1L, "video", "http://v.co/b.mp4"),
      (1L, 2L, "source", "http://v.co/b.webm"),
      (3L, 0L, "audio", "http://a.co/c.mp3")))
    val p = Html.extractMediaRefs(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
