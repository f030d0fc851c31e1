package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, SimilaritySearch}
import graft.query.Retrieval

/** PLANS.md's physical-plan claims as executable invariants (r2 verdict #6):
  * a plan regression (e.g. an ANN join degrading back to a nested loop, or a
  * pruned read losing its partition filter) fails `sbt test` instead of
  * waiting for bench archaeology. Asserts SHAPE, not timings.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private val nonEmptyPartitionFilter = "PartitionFilters: \\[[^\\]]".r

  /** Shuffle-exchange count by TREE walk (through adaptive/stage wrappers,
    * NOT into InMemoryRelation internals — a cached table's build-time
    * exchanges happen once, so they don't count against a per-iteration
    * budget the way a string grep of the plan would re-count them).
    */
  private def shuffleCount(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val extra = p match {
      case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
      case q: QueryStageExec => shuffleCount(q.plan)
      case _ => 0
    }
    val self = p match {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
      case _ => 0
    }
    self + extra + p.children.map(shuffleCount).sum
  }

  /** Output column names of every shuffle exchange in the tree (through
    * adaptive/stage wrappers) — for pinning WHAT crosses the wire, not
    * just how often.
    */
  private def exchangeOutputs(p: org.apache.spark.sql.execution.SparkPlan): Seq[Seq[String]] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = p match {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        Seq(e.output.map(_.name))
      case _ => Nil
    }
    val extra = p match {
      case a: AdaptiveSparkPlanExec => exchangeOutputs(a.executedPlan)
      case q: QueryStageExec => exchangeOutputs(q.plan)
      case _ => Nil
    }
    here ++ extra ++ p.children.flatMap(exchangeOutputs)
  }

  private val rnd = new scala.util.Random(7)
  private lazy val items = (0L until 200L)
    .map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
  private lazy val probes = items.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("pageRank pre-bucketed iteration: exactly one shuffle exchange per iteration") {
    // adjacency and node tables are repartitioned+persisted once; the rank
    // state leaves each iteration partitioned on node ≡ src, so the only
    // per-iteration exchange is the map-side-combined contribution sum
    val edges = (0L until 200L)
      .flatMap(i => Seq((i, (i * 31 + 8) % 200), (i, (i * 31 + 15) % 200)))
      .toDF("src", "dst")
    def shufflesAt(iters: Int): Int = {
      val df = graft.ops.LinkGraph.pageRank(edges, iters, releaseCache = false)
      df.collect() // finalize the adaptive plan before walking it
      shuffleCount(df.queryExecution.executedPlan)
    }
    val s2 = shufflesAt(2)
    val s5 = shufflesAt(5)
    assert(s2 == 2, s"expected 1 exchange/iteration at 2 iters, got $s2")
    assert(s5 - s2 == 3, s"per-iteration budget grew: iters2=$s2 iters5=$s5")
  }

  test("knn plans as TakeOrderedAndProject — per-partition top-k, no global sort") {
    val index = items.select(col("vec_id").as("doc_id"), col("embedding").as("vector"))
    val qv = Seq.fill(16)(0.1f)
    val p = plan(Retrieval.knn(index, qv, k = 5, threshold = -1.0))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), s"knn should not shuffle:\n$p")
  }

  test("dedupByKey plans a WindowGroupLimit (map-side per-key top-1)") {
    val scored = items.select(col("vec_id").as("doc_id"),
      (col("vec_id") % 10).cast("string").as("key"), rand(1).as("score"))
    val p = plan(Retrieval.dedupByKey(scored))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("lshTopK is a broadcast HASH join on the bucket id, never a nested loop") {
    val p = plan(SimilaritySearch.lshTopK(items, probes, dims = 16, k = 5, bits = 8, maxHamming = 2))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("both pruned ANN paths carry a non-empty static partition filter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec").toString
    val probeRows = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    SimilaritySearch.lshIndexWrite(items, s"$tmp/lsh", dims = 16, bits = 8)
    val lsh = plan(SimilaritySearch.lshTopKPruned(spark, s"$tmp/lsh", probeRows,
      dims = 16, k = 5, bits = 8, maxHamming = 1))
    assert(nonEmptyPartitionFilter.findFirstIn(lsh).isDefined, lsh)
    assert(!lsh.contains("BroadcastNestedLoopJoin"), lsh)

    val (assigned, centroids) = SimilaritySearch.ivfAssign(items, nCells = 8)
    SimilaritySearch.ivfIndexWrite(assigned, s"$tmp/ivf", Some(centroids))
    val ivf = plan(SimilaritySearch.ivfTopKPruned(spark, s"$tmp/ivf",
      SimilaritySearch.ivfCentroidsRead(spark, s"$tmp/ivf"), probeRows, k = 5, nProbe = 2))
    assert(nonEmptyPartitionFilter.findFirstIn(ivf).isDefined, ivf)
    assert(!ivf.contains("BroadcastNestedLoopJoin"), ivf)
  }

  test("single-probe pruned search reranks via TakeOrderedAndProject, not a global window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec1").toString
    SimilaritySearch.lshIndexWrite(items, s"$tmp/lsh", dims = 16, bits = 8)
    val one = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).take(1).toSeq
    val p = plan(SimilaritySearch.lshTopKPruned(spark, s"$tmp/lsh", one,
      dims = 16, k = 5, bits = 8, maxHamming = 2))
    assert(p.contains("TakeOrderedAndProject"), p)
    // plan prints root-first: the candidate join must sit BELOW the top-k
    // (fed into it), and the only Window sits ABOVE it (k rows only)
    assert(p.indexOf("BroadcastHashJoin") > p.indexOf("TakeOrderedAndProject"), p)
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"), p)
  }

  // r5 verdict #1: the per-chunk rerank must be the bounded TopK aggregator
  // (shuffle carries O(chunks·k)), never a corpus-wide window row_number
  // (shuffle carries every scored row).
  test("findSimilar reranks via the bounded TopK aggregator, not a corpus-wide window") {
    val index = items.select(col("vec_id").as("doc_id"),
      array(concat(lit("obj:"), col("vec_id") % 50)).as("object_keys"),
      col("embedding").as("vector"))
    val p = plan(Retrieval.findSimilar(index, "obj:7", k = 5, threshold = -2.0))
    // exactly one window remains: dedupByKey's WindowGroupLimit over the
    // ≤ chunks·k hydrated hits — the full-width per-chunk window is gone
    assert("Window ".r.findAllIn(p).size <= 1, s"extra window in findSimilar plan:\n$p")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.toLowerCase.contains("topk"), s"TopK aggregator missing from plan:\n$p")
  }

  // r5 verdict #3's plan half: the merge-on-read of delta sidecars — put
  // shadowing, add union, del tombstones — must be equi-joins throughout;
  // the old touched-key theta join planned a BroadcastNestedLoopJoin.
  test("store merge-on-read over all three delta kinds plans equi-joins only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec-store").toString
    val store = new graft.api.ParquetIndexStore(spark, s"$tmp/idx")
    val docs = (0L until 50L).map(i => (i, Seq(s"k${i % 10}"), s"c$i"))
      .toDF("doc_id", "object_keys", "content")
    store.replace(docs)
    new graft.api.VersionedDir(spark, s"$tmp/idx").appendDelta({ d =>
      docs.filter(col("doc_id") < 3).write.mode("overwrite").parquet(d)
    }, kind = "put")
    store.upsert(docs.filter(col("doc_id") >= 48).withColumn("doc_id", col("doc_id") + 100))
    store.delete(Seq(5L))
    val p = plan(store.read())
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // r5 verdict #5's plan half: overlaying an incremental-ANN delta must not
  // cost the base scan its static partition filter (the pruned read stays
  // pruned; the delta rides in as a broadcast-side union).
  test("pruned ANN read keeps its static partition filter under a delta overlay") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec-delta").toString
    SimilaritySearch.lshIndexWrite(items, s"$tmp/lsh", dims = 16, bits = 8)
    val probeRows = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val delta = items.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding"),
        lit(3L).as("bucket"), lit(false).as("deleted"))
    val p = plan(SimilaritySearch.lshTopKPruned(spark, s"$tmp/lsh", probeRows,
      dims = 16, k = 5, bits = 8, maxHamming = 1, delta = Some(delta)))
    assert(nonEmptyPartitionFilter.findFirstIn(p).isDefined, p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  // filtered search (round 8): the payload predicate must reach the parquet
  // scan — as PushedFilters on the exact path, and COMPOSED with the static
  // partition filter on the pruned-ANN path. A regression to a post-scan (or
  // post-topk) filter changes both semantics and the 100 TB read volume.
  test("filtered search: payload predicate composes with pruning and parquet pushdown") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec-filt").toString
    val labeled = items.withColumn("label", (col("vec_id") % 2).cast("int"))
    labeled.write.parquet(s"$tmp/emb")
    val emb = spark.read.parquet(s"$tmp/emb")
    val pushedLabel = "PushedFilters: \\[[^\\]]*label".r

    // exact path (q_knn_filtered shape): In(label, …) lands in PushedFilters
    // and the plan still tops out at TakeOrderedAndProject with no shuffle
    val index = emb.filter(col("label").isin(1))
      .select(col("vec_id").as("doc_id"), col("embedding").as("vector"))
    val pExact = plan(Retrieval.knn(index, Seq.fill(16)(0.1f), k = 5, threshold = -1.0))
    assert(pushedLabel.findFirstIn(pExact).isDefined, pExact)
    assert(pExact.contains("TakeOrderedAndProject") && !pExact.contains("Exchange"), pExact)

    // pruned-IVF path: PartitionFilters (cell IN …) AND PushedFilters (label)
    // on the same scan
    val (assigned, centroids) = SimilaritySearch.ivfAssign(labeled, nCells = 8)
    SimilaritySearch.ivfIndexWrite(assigned, s"$tmp/ivf", Some(centroids))
    val probeRows = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val pIvf = plan(SimilaritySearch.ivfTopKPruned(spark, s"$tmp/ivf",
      SimilaritySearch.ivfCentroidsRead(spark, s"$tmp/ivf"), probeRows,
      k = 5, nProbe = 2, payloadFilter = Some(col("label") === 1)))
    assert(nonEmptyPartitionFilter.findFirstIn(pIvf).isDefined, pIvf)
    assert(pushedLabel.findFirstIn(pIvf).isDefined, pIvf)
  }

  // the SQ/BQ candidate scans must read the CODES column only — pulling the
  // float vector back into the scored scan silently forfeits the 4×/32×
  // bytes-per-row win that is the whole point of quantization.
  test("SQ/BQ candidate scoring scans codes only — no vector column before the rerank") {
    import graft.ops.{BinaryQuantization, ScalarQuantization}
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec-q").toString
    val probes1 = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).take(1).toSeq
    val (mins, maxs) = ScalarQuantization.collectParams(ScalarQuantization.sqTrain(items))
    ScalarQuantization.sqIndexWrite(
      ScalarQuantization.sqEncode(items, mins, maxs).select("vec_id", "sq"),
      ScalarQuantization.sqTrain(items), s"$tmp/sq")
    val codes = spark.read.parquet(graft.api.VersionedDir.resolve(spark, s"$tmp/sq"))
    val p = plan(ScalarQuantization.sqTopK(codes, items, mins, maxs, probes1, k = 5))
    // exactly one scan mentions `embedding` (the rerank join); the scored
    // scan reads (vec_id, sq) only
    val codeScans = "ReadSchema: [^\\n]*sq:binary".r.findAllIn(p).toSeq
    assert(codeScans.nonEmpty, s"no codes-only scan in:\n$p")
    assert(codeScans.forall(!_.contains("embedding")),
      s"quantized scan drags the float vector along:\n$p")
  }

  test("LSH dedup candidate generation is an equi-join shuffle, not a cross join") {
    val docs = (1L to 40L).map(i => (i, s"words making up document number $i with shared tail"))
      .toDF("doc_id", "text")
    val p = plan(Dedup.minhashLshCandidates(docs, "text", numHashes = 8,
      rowsPerBand = 2, shingleSize = 3, hotBucketCap = 64))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("media dedup: payload bytes never cross an exchange (hash rows only)") {
    // the 100 TB posture of image/audio dedup: decode + fingerprint run
    // inside the scan partition and only ~28-byte (id, hash) rows shuffle —
    // a media column leaking into an exchange would ship the corpus bytes
    val clips = (0 until 40).map(i => (i.toLong, SparkEntry.synthWav(i % 5)))
      .toDF("doc_id", "media")
    val audio = graft.ops.Multimodal.audioDedup(clips, "doc_id")
    audio.collect()
    val aEx = exchangeOutputs(audio.queryExecution.executedPlan)
    assert(aEx.nonEmpty && aEx.forall(cols => !cols.contains("media")), aEx.toString)
    val imgs = (0 until 40).map(i => (i.toLong, SparkEntry.synthPng(i % 5)))
      .toDF("doc_id", "media")
    val image = graft.ops.Multimodal.imageDedup(imgs, "doc_id")
    image.collect()
    val iEx = exchangeOutputs(image.queryExecution.executedPlan)
    assert(iEx.nonEmpty && iEx.forall(cols => !cols.contains("media")), iEx.toString)
  }

  test("crossCorpusDedup: text never crosses an exchange; ref cap is map-side") {
    val docs = (0L until 50L).map(i =>
      (i, s"words making up document number $i with a shared tail of tokens"))
      .toDF("doc_id", "text")
    val df = Dedup.crossCorpusDedup(docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 3 === 0), threshold = 0.5)
    df.collect()
    val p = plan(df)
    // hot-ref capping must stay a WindowGroupLimit (bounded per-task state),
    // and the document text itself must never ride a shuffle — exchanges
    // carry (id, band, bucket) triples and candidate shingle arrays only
    assert(p.contains("WindowGroupLimit"), p)
    val ex = exchangeOutputs(df.queryExecution.executedPlan)
    assert(ex.nonEmpty && ex.forall(cols => !cols.contains("text")), ex.toString)
  }

  test("keep-best ingest: text never crosses an exchange, no cartesian, capped ref window") {
    val docs = (0L until 50L).map(i =>
      (i, s"words making up document number $i with a shared tail of tokens", i % 7))
      .toDF("doc_id", "text", "quality")
    val neu = docs.filter(col("doc_id") % 3 =!= 0)
    val ref = docs.filter(col("doc_id") % 3 === 0)
    // the DECISION stage (pre-checkpoint): same contract as
    // crossCorpusDedup — the ref-side hot-bucket cap is a
    // WindowGroupLimit, nothing goes cartesian, and the document text
    // never rides a shuffle
    val dec = Dedup.crossCorpusDedupKeepBest(neu, ref, "quality", threshold = 0.5)
    dec.collect()
    val pd = plan(dec)
    assert(pd.contains("WindowGroupLimit"), pd)
    assert(!pd.toLowerCase.contains("cartesian"), pd)
    val exD = exchangeOutputs(dec.queryExecution.executedPlan)
    assert(exD.nonEmpty && exD.forall(cols => !cols.contains("text")), exD.toString)
    // the APPLIED stage (post lineage cut): id-only set operations —
    // no cartesian, no text on any exchange, and the retire anti-join
    // broadcasts the small side
    val df = Dedup.ingestKeepBest(neu, ref, "quality", threshold = 0.5)
    df.collect()
    val p = plan(df)
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(p.contains("LeftAnti"), p)
    val ex = exchangeOutputs(df.queryExecution.executedPlan)
    assert(ex.forall(cols => !cols.contains("text")), ex.toString)
  }

  test("bloom cross-corpus dedup: probe prunes before the verify join; text never shuffles") {
    // parquet-backed: local relations would fold the whole pipeline at
    // optimization time and leave nothing to pin
    val dir = java.nio.file.Files.createTempDirectory("bloomplan").toString
    (0L until 50L).map(i =>
      (i, s"words making up document number $i with a shared tail of tokens"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val ref = docs.filter(col("doc_id") % 3 === 0)
    val bf = Dedup.buildFingerprintBloom(ref, expectedItems = 64, fpp = 0.01)
    val df = Dedup.crossCorpusExactDedupBloom(docs.filter(col("doc_id") % 3 =!= 0), ref, bf)
    df.collect()
    val p = plan(df)
    // the bloom probe is a per-row filter in the scan stage (upstream of the
    // verify semi-join's exchange), and document text never rides a shuffle
    assert(p.toLowerCase.contains("bloommightcontain"), p)
    assert(p.contains("LeftSemi"), p)
    // at gate size the verify joins broadcast (no shuffle exchange at all);
    // whatever exchanges exist must not carry the document text
    val ex = exchangeOutputs(df.queryExecution.executedPlan)
    assert(ex.forall(cols => !cols.contains("text")), ex.toString)
  }

  test("prototypicality: one kernel scan, exactly one cell-keyed exchange (the rank window)") {
    val rnd = new scala.util.Random(7)
    val emb = (0L until 60L).map(i => (i, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val df = graft.ops.SimilaritySearch.prototypicality(emb, nCells = 4, pruneEasiest = 0.5)
    df.collect()
    // AQE plan strings repeat the tree under "== Initial Plan ==" — count
    // exchanges in the final plan only
    val p = plan(df).split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"assignment+distance must be a kernel, not a join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly the cell-window exchange, got $hashEx:\n$p")
  }

  test("quality classifier scoring broadcasts the weight table; one doc-keyed exchange") {
    val docs = (0L until 40L).map(i => (i, s"some words for document $i body"))
      .toDF("doc_id", "text")
    val wts = graft.ops.TextAnalysis.trainQualityClassifier(docs,
      col("doc_id") % 2 === 0, buckets = 64, iters = 1, lr = 10.0)
    val df = graft.ops.TextAnalysis.scoreQualityClassifier(docs, wts, buckets = 64)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must never shuffle by bucket:\n$p")
  }

  test("repetitionSignals is one kernel scan — zero exchanges") {
    val docs = (1L to 40L).map(i => (i, s"words for document $i repeated words"))
      .toDF("doc_id", "text")
    val p = plan(graft.ops.TextAnalysis.repetitionSignals(docs))
    assert(!p.contains("Exchange"), s"repetition must run at scan speed:\n$p")
  }

  test("fix_mojibake is an exchange-free row-local projection") {
    val docs = (1L to 40L).map(i => (i, s"CafÃ© garbled doc $i")).toDF("doc_id", "text")
    val p = plan(docs.select(col("doc_id"),
      graft.functions.textkernel.fix_mojibake(col("text")).as("fixed")))
    assert(!p.contains("Exchange"), s"mojibake repair must run at scan speed:\n$p")
  }

  test("decontaminate broadcasts the eval grams; corpus shuffles one row per doc") {
    val docs = (1L to 40L).map(i => (i, s"words making up document number $i here"))
      .toDF("doc_id", "text")
    val p = plan(graft.ops.TextAnalysis.decontaminate(docs, docs.limit(5), n = 3))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must never shuffle by gram:\n$p")
    // the corpus lineage shuffles exactly once, keyed by doc — one row per
    // document after the map-side partial agg; the only other hash exchange
    // is the EVAL-sized distinct feeding the BroadcastExchange
    val docShuffles = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length
    val allShuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(docShuffles == 1, s"expected one groupBy(doc) exchange, got $docShuffles:\n$p")
    assert(allShuffles == 2, s"unexpected extra exchange (corpus grams must not shuffle):\n$p")
  }

  // r6 verdict nit #1: no operator may plan a partition-less window — a
  // single-task, whole-relation sort is the pattern that dies first at scale.
  // pqTrain (the one past offender, ≤ ksub rows) now ranks driver-side.
  test("no gate-path plan contains an unpartitioned window") {
    import graft.ops.{FullText, ProductQuantization, TextAnalysis}
    val cfg = ProductQuantization.PqConfig(dims = 16, m = 4, ksub = 8)
    val docs = (0L until 60L).map(i => (i, s"some words for document $i"))
      .toDF("doc_id", "text")
    // r20 (VERDICT r19 #2): hybridRrf and mmrRerank join the invariant's
    // coverage — the r19 lit(0) partition key was FOLDABLE, so the
    // optimizer erased it and the executed WindowExec ran unpartitioned
    // anyway. Both now plan ZERO windows (ranks ride the single sorted
    // TakeOrderedAndProject partition; mmr's greedy loop is driver-side).
    val plans = Seq(
      plan(ProductQuantization.pqEncode(items, ProductQuantization.pqTrain(items, cfg), cfg)),
      plan(TextAnalysis.packSequences(docs, tokenBudget = 20)),
      plan(TextAnalysis.mixtureOrder(docs.withColumn("lang", lit("a")),
        Map.empty, groupCol = "lang")),
      plan(Retrieval.dedupByKey(items.select(col("vec_id").as("doc_id"),
        (col("vec_id") % 10).cast("string").as("key"), rand(1).as("score")))),
      plan(FullText.hybridRrf(docs, "words document", k = 5, kCand = 10)),
      plan(FullText.mmrRerank(docs, "words document", k = 3, kCand = 6)))
    // windowspecdefinition(...) prints its partition spec first; an empty
    // partition spec starts straight at the ordering clause's ASC/DESC args
    val unpartitioned = "windowspecdefinition\\([^)]*".r
    plans.foreach { p =>
      unpartitioned.findAllIn(p).foreach { spec =>
        assert(spec.contains("#"), s"window lacks a partition spec: $spec\n$p")
        val head = spec.drop("windowspecdefinition(".length).takeWhile(_ != ',')
        assert(!head.contains("ASC") && !head.contains("DESC"),
          s"unpartitioned window (order-only spec): $spec\n$p")
        // a FOLDABLE partition key (e.g. lit(0)) is erased by the optimizer
        // at runtime — the partition spec must reference a real attribute
        // (r19 ADVICE: keep the invariant's teeth)
        assert(head.contains("#"),
          s"foldable/constant window partition key (optimized away at runtime): $spec\n$p")
      }
    }
  }

  // the hybridRrf ranks depend on TakeOrderedAndProject's contract (ONE
  // output partition, rows in sort order) — pin the plan shape AND the
  // rank values so a planner change that breaks either fails loudly here
  // rather than at the oracle
  test("hybridRrf: ranks ride TakeOrderedAndProject, no window, values = row_number order") {
    import graft.ops.FullText
    val docs = (0L until 60L).map(i => (i, s"some words w$i for document number $i"))
      .toDF("doc_id", "text")
    val df = FullText.hybridRrf(docs, "words document", k = 8, kCand = 12)
    val p = plan(df)
    assert(!p.contains("WindowExec") && !p.contains("windowspecdefinition"),
      s"hybridRrf must plan zero windows:\n$p")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"both rank pages must come from TakeOrderedAndProject:\n$p")
    // vec_rank must equal the position in (cos desc, doc_id asc) order —
    // recompute the expected ranks from the unranked cosine page
    val rows = df.select("doc_id", "vec_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = FullText.hashEmbedCosine(docs, "words document")
      .orderBy(desc("cos"), col("doc_id").asc).limit(12)
      .select("doc_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    rows.foreach { case (id, rk) =>
      if (rk != 0L) assert(expected.get(id).contains(rk),
        s"vec_rank mismatch for doc $id: got $rk, want ${expected.get(id)}")
    }
  }

  // r8 verdict #1: the e2e corpus composition must not multiply upstream
  // work. Every super-stage boundary is persisted (each consumer references
  // its input 2-3×; unbounded lazy composition measured 121 hash exchanges
  // — re-planning the whole upstream per reference), so the runtime stage
  // count is the SUM of the stages' own work, and a re-run over the cached
  // boundary executes only the final packing.
  test("corpus e2e pipeline executes each stage once: bounded stages, cached boundaries") {
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = SparkEntry.queries("q_corpus_e2e")(spark, "/root/testdata/sf0.001")
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      // the survivors boundary is an eager localCheckpoint: the packing
      // plans over materialized rows with TRUNCATED lineage (re-planning
      // the full 5-stage tree per driver action cost ~2 s each)
      assert(p.contains("ExistingRDD"), s"survivors boundary is not checkpointed:\n$p")
      assert(df.collect().nonEmpty)
      Thread.sleep(2000) // listener bus is async
      val first = stages.get()
      // measured 44 at sf0.001 (fixture write + one materialization per
      // boundary + final pack); 60 leaves AQE drift room while still
      // failing on any return to per-reference recompute (121+ exchanges)
      assert(first <= 60, s"first run executed $first stages — stage reuse regressed")
      stages.set(0)
      assert(SparkEntry.queries("q_corpus_e2e")(spark, "/root/testdata/sf0.001")
        .collect().nonEmpty)
      Thread.sleep(2000)
      val second = stages.get()
      // the final packing alone re-plans ~15 stages (prefix-sum machinery +
      // assemble + sort); 20 bounds it well under the 44-stage full run
      assert(second <= 20,
        s"re-run executed $second stages — boundaries not served from cache")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("lexical retrieval plan shapes: filtered shuffle, WindowGroupLimit rank, windowless seg-dedup") {
    import graft.ops.{Dedup, FullText}
    val docs = (0L until 60L).map(i => (i, s"some words w$i for document number $i"))
      .toDF("doc_id", "text")
    // BM25 (r20): term tf and dl come from ONE multi_marker_hits kernel
    // pass materialized per call — the plan explodes the per-term count
    // ARRAY (filtered tf > 0, ≤|terms| rows per doc), never the corpus
    // token stream, and the top-k stays per-partition
    // (TakeOrderedAndProject), never a global sort+limit
    val bm = plan(FullText.bm25TopK(docs, "words document", k = 5))
    assert(bm.contains("TakeOrderedAndProject"), bm)
    assert(bm.contains("posexplode") && bm.contains("Scan ExistingRDD"), bm)
    assert(!bm.contains("marker_hits"),
      s"the term-count kernel must run in the checkpoint job, not per consumer:\n$bm")
    // (the only keyless join is the 1-row stats attach — a broadcast
    // nested-loop against a single-row build side, which is the right plan)
    assert(!bm.contains("CartesianProduct"), bm)
    // TF-IDF: the rank<=k filter reaches the window as a WindowGroupLimit
    // (<=k rows per doc forwarded through the shuffle, not every term)
    val tf = plan(FullText.tfIdfTopTerms(docs, k = 3))
    assert(tf.contains("WindowGroupLimit"), tf)
    // segment dedup (r13 rewrite): keeper marking is ONE digest-keyed
    // window min (the groupBy+join-back form materialized the
    // tokenize+explode subtree three times), order restore is sort_array
    // over collected structs — no join, no cartesian anything, and the
    // whole op is exactly two shuffles (digest window, doc rebuild).
    val sdDf = Dedup.segmentDedup(docs, segWords = 3)
    val sd = plan(sdDf)
    assert(sd.contains("windowspecdefinition"), sd)
    assert(!sd.contains("Join"), sd)
    assert(!sd.contains("CartesianProduct") && !sd.contains("BroadcastNestedLoopJoin"), sd)
    assert(shuffleCount(sdDf.queryExecution.executedPlan) == 2, sd)
  }

  test("ivfAssign is zero-exchange up to the assignment (per-row kernel argmin)") {
    val (assigned, _) = SimilaritySearch.ivfAssign(items, nCells = 8)
    assert(!plan(assigned).contains("Exchange"), plan(assigned))
  }

  test("PQ ADC scoring reads codes only (embedding pruned out) and stays codegen'd") {
    import graft.ops.ProductQuantization
    val cfg = ProductQuantization.PqConfig(dims = 16, m = 4, ksub = 8)
    val cb = ProductQuantization.pqTrain(items, cfg)
    // a stored codes index: (vec_id, codes) parquet — the deployment shape
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec-pq").toString
    ProductQuantization.pqEncode(items, cb, cfg).select("vec_id", "codes")
      .write.parquet(s"$tmp/codes")
    // embedding table lives elsewhere; only the rerank may touch it
    items.write.parquet(s"$tmp/full")
    val probeRows = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val df = ProductQuantization.adcTopK(
      spark.read.parquet(s"$tmp/codes"), spark.read.parquet(s"$tmp/full"),
      cb, probeRows, cfg, k = 5, refine = 2)
    val p = plan(df)
    // the codes scan must not read a vector column; pq_adc runs inside
    // whole-stage codegen (it has doGenCode)
    val codesScan = p.linesIterator.find(l => l.contains(s"$tmp/codes")).getOrElse("")
    assert(!codesScan.contains("embedding"), s"codes scan reads embeddings:\n$codesScan")
    assert(p.contains("pq_adc"), p)
  }

  // the persisted lexical index must behave like the ANN indexes: a query
  // reads ONLY its terms' bucket partitions (PartitionFilters) with the
  // term predicate pushed to the scan — losing either silently degrades
  // to a full-postings scan at 100 TB.
  test("indexed BM25 reads pruned bucket partitions with the term filter pushed") {
    import graft.ops.FullText
    val tmp = java.nio.file.Files.createTempDirectory("graft-planspec-inv").toString + "/idx"
    val docs = Seq((1L, "spark hash join"), (2L, "window stream fast"),
      (3L, "spark stream")).toDF("doc_id", "text")
    FullText.invertedIndexWrite(docs, tmp, nBuckets = 16)
    val p = plan(FullText.bm25TopKIndexed(spark, tmp, "spark join", k = 5, nBuckets = 16))
    assert(nonEmptyPartitionFilter.findFirstIn(p).isDefined, p)
    assert("PushedFilters: \\[[^\\]]*term".r.findFirstIn(p).isDefined, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // zero corpus-side joins: the only join is the broadcast stats row
    assert(!p.contains("SortMergeJoin"), p)
  }

  // The Sampling family's scaladoc claims scan-speed per-row math; pin it:
  // split/sample assignment must add ZERO exchanges over its input, and
  // leakageFreeSplit must add only the cluster join's exchanges (the split
  // draw on cluster_id is a projection, not another shuffle).
  test("sampling assignments are exchange-free projections; leakage split adds only the join") {
    import graft.ops.Sampling
    val docs = (0L until 50L).toDF("doc_id")
    val splits = Seq("train" -> 0.75, "test" -> 0.25)
    assert(shuffleCount(Sampling.splitAssign(docs, splits).queryExecution.executedPlan) == 0)
    assert(shuffleCount(Sampling.sampleFraction(docs, 0.5).queryExecution.executedPlan) == 0)
    assert(shuffleCount(Sampling.stratifiedSample(
      docs.withColumn("lang", lit("en")), Map("en" -> 0.5), "lang")
      .queryExecution.executedPlan) == 0)
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val lf = Sampling.leakageFreeSplit(docs, pairs, splits)
    val p = plan(lf)
    // no cartesian anything; the only plan nodes beyond the cluster join
    // are projections (the md5 draw + interval fold)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  // q_ccnet_bucket's documented shape: the band thresholds come from a
  // HISTOGRAM (langs × score-resolution rows) — the per-lang windows run
  // on that aggregated table, and the threshold table joins back by
  // BROADCAST. A naive impl would ntile the whole corpus inside per-lang
  // window partitions; this pins that no corpus-sized window exists (the
  // plan's Window operators sit above the histogram aggregate) and that
  // the join-back never degrades to a shuffle join.
  test("surprisalBuckets: broadcast threshold join-back, windows only above the histogram aggregate") {
    import graft.ops.FullText
    val docs = (0L until 40L)
      .map(i => (i, s"alpha beta w$i x$i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val df = FullText.surprisalBuckets(docs)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    // (BroadcastNestedLoopJoin IS expected once: bigramSurprisal's 1-row
    // vocab-size stat joins condition-less by broadcast — the accepted
    // broadcast-stats shape)
    assert(!p.contains("CartesianProduct"), p)
    // the windows must consume the (lang, score) aggregate, never raw docs:
    // every Window node in the tree has a HashAggregate descendant keyed by
    // score_mnat before any scan of the docs
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def findWindows(sp: SparkPlan): Seq[WindowExec] = sp match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => findWindows(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findWindows(q.plan)
      case w: WindowExec => w +: w.children.flatMap(findWindows)
      case other => other.children.flatMap(findWindows)
    }
    def hasHistAggBelow(sp: SparkPlan): Boolean = sp match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => hasHistAggBelow(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => hasHistAggBelow(q.plan)
      case agg: BaseAggregateExec
        if agg.groupingExpressions.exists(_.toString.contains("score_mnat")) => true
      case other => other.children.exists(hasHistAggBelow)
    }
    val windows = findWindows(df.queryExecution.executedPlan)
    assert(windows.nonEmpty)
    windows.foreach(w => assert(hasHistAggBelow(w),
      s"window not above the histogram aggregate:\n$w"))
  }

  // the r16 KN plan claim: the five stat tables consolidate onto the
  // trigram TYPE table, so the DOC side (the big side at scale) joins
  // exactly once on (w1,w2,w3) — no per-level re-join of instance rows,
  // no cartesian (the 1-row totals stat rides the accepted
  // BroadcastNestedLoopJoin shape), no window anywhere.
  test("trigramSurprisalKN: doc side joins the consolidated LM once, no cartesian, no window") {
    import graft.ops.FullText
    val docs = (0L until 30L)
      .map(i => (i, s"alpha beta gamma w$i x$i y$i"))
      .toDF("doc_id", "text")
    val df = FullText.trigramSurprisalKN(docs)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // r19: the context marginals ride the type tables as WINDOW aggregates
    // (replacing their groupBy+join) — every window must be PARTITIONED
    // (by context/suffix keys: vocabulary-bound groups, the same
    // cardinality class the replaced aggregation shuffles handled); a
    // corpus-keyed or unpartitioned window would be a scale bug
    assertAllWindowsPartitioned(df)
    // exactly ONE join keyed by all three words: the doc-side LM join.
    // (stat-consolidation joins are keyed by 1-2 words each)
    val threeWordJoins = "(?s)Join [^\\n]*w1[^\\n]*w2[^\\n]*w3".r
      .findAllIn(p).size
    assert(threeWordJoins == 1, s"want 1 three-word join, got $threeWordJoins:\n$p")
  }

  /** every WindowExec in the executed plan has a non-empty partitionSpec
    * containing no doc-id column (windows bounded by data-derived groups,
    * never the corpus row space).
    */
  private def assertAllWindowsPartitioned(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    def findWindows(sp: SparkPlan): Seq[WindowExec] = sp match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => findWindows(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findWindows(q.plan)
      case w: WindowExec => w +: w.children.flatMap(findWindows)
      case other => other.children.flatMap(findWindows)
    }
    findWindows(df.queryExecution.executedPlan).foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window:\n$w")
      assert(!w.partitionSpec.exists(_.toString.contains("doc_id")),
        s"doc-keyed window in an LM stat plan:\n$w")
    }
  }

  test("fourgramSurprisalKN: one consolidated four-word doc-side join, no cartesian, no window") {
    import graft.ops.FullText
    val docs = (0L until 30L)
      .map(i => (i, s"alpha beta gamma delta w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val df4 = FullText.fourgramSurprisalKN(docs)
    val p = plan(df4)
    assert(!p.contains("CartesianProduct"), p)
    assertAllWindowsPartitioned(df4) // r19: see the trigram pin
    val fourWordJoins = "(?s)Join [^\\n]*w1[^\\n]*w2[^\\n]*w3[^\\n]*w4".r
      .findAllIn(p).size
    assert(fourWordJoins == 1, s"want 1 four-word join, got $fourWordJoins:\n$p")
  }

  // q_ann_hnsw's documented shape: the only exchanges are the shard
  // repartition and the bounded top-k merge (TopKAggregator partial agg —
  // O(shards·probes·k) rows); no window over scored candidates, no
  // cartesian anything.
  test("hnswTopK: two exchanges (shard + bounded merge), no candidate window, no cartesian") {
    import graft.ops.Hnsw
    val items = (0L until 64L)
      .map(i => (i, Seq.tabulate(8)(d => (i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val probes = items.limit(2).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val df = Hnsw.hnswTopK(items, probes, dims = 8, k = 3, shards = 4)
    val p = plan(df)
    assert(!p.contains("WindowExec") && !p.contains("Window "), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(shuffleCount(df.queryExecution.executedPlan) <= 3, p)
  }

  // q_cluster_profile's documented shape: cell assignment is a kernel
  // projection (no exchange), the per-cell top-k is a rank window whose
  // <=k filter reaches the window operator as a WindowGroupLimit (bounded
  // per-task state — never a full per-cell sort forwarded whole).
  test("clusterProfile: WindowGroupLimit top-k, no cartesian, kernel cell assignment") {
    val docs = (0L until 60L).map(i => (i, s"topic t${i % 4} words number $i"))
      .toDF("doc_id", "text")
    val prof = SimilaritySearch.clusterProfile(items, docs, nCells = 4, topTerms = 3)
    val p = plan(prof)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
