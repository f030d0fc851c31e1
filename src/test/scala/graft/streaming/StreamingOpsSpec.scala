package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.{EmbeddingField, IndexConfig}
import graft.embed.HashEmbeddingBackend

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  final case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedCounts aggregates a micro-batched stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingOps.windowedCounts(input.toDF(), watermark = "1 hour", windowLength = "1 day")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    input.addData(
      Ev(ts("2024-01-01 01:00:00"), "view", 1.0),
      Ev(ts("2024-01-01 02:00:00"), "view", 2.0),
      Ev(ts("2024-01-02 01:00:00"), "click", 5.0))
    query.processAllAvailable()
    val got = spark.sql("SELECT event_type, n_events, sum_value FROM wc").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    query.stop()
    assert(got("view") == (2L, 3.0))
    assert(got("click") == (1L, 5.0))
  }

  test("stateless cleaning ops (redactPii, repetitionSignals) run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // the batch operators ARE the streaming operators: pure projections
    // (kernel + regexp), no aggregation state — append mode, no watermark
    val q1 = graft.ops.TextAnalysis.redactPii(docs)
      .writeStream.format("memory").queryName("pii_stream").outputMode("append").start()
    val q2 = graft.ops.TextAnalysis.repetitionSignals(docs)
      .writeStream.format("memory").queryName("rep_stream").outputMode("append").start()
    input.addData((1L, "mail a@b.io now"), (2L, "a a a a"))
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val pii = spark.sql("SELECT doc_id, n_emails, redacted FROM pii_stream").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(pii(1L) == ((1L, "mail [EMAIL] now")))
    assert(pii(2L) == ((0L, "a a a a")))
    val rep = spark.sql("SELECT doc_id, dup_word_frac FROM rep_stream").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(2L) == 0.75)
  }

  test("sessions emits closed sessions via flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    // NoTimeout keeps processAllAvailable from spinning on timeout batches;
    // production uses the default processing-time timeout to flush idle keys
    val query = StreamingOps.sessions(events, gapSeconds = 1800,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    val t0 = ts("2024-01-01 10:00:00")
    def plus(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // user 100: two events 10s apart, then a 2h gap -> first session closes
    input.addData((100L, t0), (100L, plus(10)), (100L, plus(7200)))
    query.processAllAvailable()
    val got = spark.sql("SELECT user_id, n_events FROM sess").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    query.stop()
    assert(got.toSeq == Seq((100L, 2L)))
  }

  test("incrementalIndex maintains a parquet index across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val indexPath = s"$tmp/idx"
    val input = MemoryStream[(Long, String, String)]
    val config = IndexConfig("s", "id", Seq(EmbeddingField("title", important = true),
      EmbeddingField("body")), tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val q = StreamingOps.incrementalIndex(
      input.toDF().toDF("id", "title", "body"), config, HashEmbeddingBackend(16),
      "page", "id", indexPath, s"$tmp/chk")
    input.addData((1L, "T1", "first page body"), (2L, "T2", "second page body"))
    q.processAllAvailable()
    val after1 = graft.pipeline.IndexBuild.readIndex(spark, indexPath)
    assert(after1.count() == 2)
    // update object 1, add object 3
    input.addData((1L, "T1", "first page body CHANGED"), (3L, "T3", "third page"))
    q.processAllAvailable()
    q.stop()
    val after2 = graft.pipeline.IndexBuild.readIndex(spark, indexPath)
    assert(after2.count() == 3)
    val keys = after2.select(col("object_keys").getItem(0)).as[String].collect().toSet
    assert(keys == Set("page:1", "page:2", "page:3"))
    val c1 = after2.filter(array_contains(col("object_keys"), "page:1"))
      .select("content").as[String].head()
    assert(c1.contains("CHANGED"))
  }

  // the r7 HTTP connector under the streaming pipeline: every micro-batch's
  // embed stage calls the wire (executor-side), including a retried 429 —
  // the full offline proof that the production embedding path and the
  // streaming index machinery compose
  test("incrementalIndex embeds each micro-batch through the HTTP connector") {
    implicit val sqlCtx = spark.sqlContext
    val stub = new graft.embed.HttpStub(failFirst = 1, failStatus = 429)
    try {
      val backend = graft.embed.HttpEmbeddingBackend(
        stub.embeddingsUrl, "stub-model", dims = 16, maxRetries = 3, backoffMs = 1)
      val tmp = java.nio.file.Files.createTempDirectory("graft-stream-http").toString
      val input = MemoryStream[(Long, String, String)]
      val config = IndexConfig("sh", "id", Seq(EmbeddingField("title", important = true),
        EmbeddingField("body")), tokenLimit = 64, chunkOverlap = 8, dims = 16)
      val q = StreamingOps.incrementalIndex(
        input.toDF().toDF("id", "title", "body"), config, backend,
        "page", "id", s"$tmp/idx", s"$tmp/chk")
      input.addData((1L, "T1", "first page body"), (2L, "T2", "second page body"))
      q.processAllAvailable()
      input.addData((3L, "T3", "third page"))
      q.processAllAvailable()
      q.stop()
      val idx = graft.pipeline.IndexBuild.readIndex(spark, s"$tmp/idx")
      assert(idx.count() == 3)
      // vectors are exactly what the wire returned for each stored content
      idx.select("content", "vector").collect().foreach { r =>
        assert(r.getSeq[Float](1) == stub.vectorFor(r.getString(0)).toSeq)
      }
      assert(stub.embedCalls.get() >= 2, "each batch must hit the wire")
      assert(stub.calls.get() > stub.embedCalls.get(), "the injected 429 was retried")
    } finally stub.stop()
  }

  test("streamingExactDedup drops same-content arrivals within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = ts("2024-03-01 12:00:00")
    def plus(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val q = StreamingOps.streamingExactDedup(
        input.toDF().toDF("doc_id", "text", "ts"), watermark = "1 hour")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    // same normalized content (case/extra-space-insensitive), one unique doc
    input.addData(
      (1L, "The quick brown fox", t0),
      (2L, "the quick  BROWN fox", plus(10)),
      (3L, "something else entirely", plus(20)))
    q.processAllAvailable()
    // a later batch replays the same content inside the watermark horizon
    input.addData((4L, "the quick brown FOX", plus(60)))
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id FROM sdedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(1L, 3L)) // 2 (same batch) and 4 (later batch) deduped
  }

  test("streamingCrossCorpusDedup drops reference dups statelessly (no watermark needed)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ref = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "reference only content never in the stream"))
      .toDF("doc_id", "text")
    val bf = graft.ops.Dedup.buildFingerprintBloom(ref, expectedItems = 64, fpp = 0.01)
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingCrossCorpusDedup(
        input.toDF().toDF("doc_id", "text"), bf)
      .writeStream.format("memory").queryName("sxdedup").outputMode("append").start()
    input.addData(
      (1L, "THE quick  brown FOX jumps over the lazy dog"), // normalized dup of ref 10
      (2L, "entirely fresh crawl content"),
      (3L, "more fresh words not in the reference"))
    q.processAllAvailable()
    input.addData((4L, "the quick brown fox jumps over the lazy dog")) // verbatim ref dup
    q.processAllAvailable()
    val got = spark.sql("SELECT doc_id FROM sxdedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(2L, 3L), got.toString)
  }

  test("streamingMediaDedup: identical clips collapse, junk dropped, state keyed by fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val t0 = ts("2024-03-01 12:00:00")
    def plus(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val q = StreamingOps.streamingMediaDedup(
        input.toDF().toDF("doc_id", "media", "ts"), kind = "audio", watermark = "1 hour")
      .writeStream.format("memory").queryName("smedia").outputMode("append").start()
    val wavA = graft.SparkEntry.synthWav(3)
    val wavB = graft.SparkEntry.synthWav(7)
    input.addData(
      (1L, wavA, t0),
      (2L, wavA, plus(10)),                 // same-batch perceptual dup
      (3L, wavB, plus(20)),                 // distinct signal survives
      (4L, "not audio".getBytes, plus(25))) // no identity → dropped
    q.processAllAvailable()
    input.addData((5L, wavA, plus(60)))     // later batch, inside watermark
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM smedia").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(1L, 3L))
  }

  test("streamingUrlDedup: tracking variants collapse on the stream; front-end ops run stateless") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val t0 = ts("2024-03-01 12:00:00")
    def plus(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val docs = input.toDF().toDF("doc_id", "url", "html", "ts")
    val q = StreamingOps.streamingUrlDedup(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("surl").outputMode("append").start()
    // the HTML extraction path is pure projection: runs on the SAME stream
    val q2 = graft.ops.Html.extractText(docs.select($"doc_id", $"html"))
      .writeStream.format("memory").queryName("shtml").outputMode("append").start()
    input.addData(
      (1L, "http://A.com/x?utm_source=t", "<p>first crawl words</p>", t0),
      (2L, "http://a.com/x", "<p>tracking twin</p>", plus(5)),
      (3L, "garbage-url", "<p>no identity</p>", plus(6)),
      (4L, "http://b.org/y#frag", "<p>other site</p>", plus(7)))
    q.processAllAvailable()
    input.addData((5L, "http://a.com/x#top", "<p>recrawl</p>", plus(50)))
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM surl").collect().map(_.getLong(0)).toSet
    q.stop(); q2.processAllAvailable(); q2.stop()
    assert(kept == Set(1L, 4L)) // 2/5 dedup to 1; 3 unparseable dropped
    val html = spark.sql("SELECT doc_id, text FROM shtml").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(html(1L) == "first crawl words")
  }

  test("streamingNearDupCandidates pairs arrivals with the bucket representative, O(B) state") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val input = MemoryStream[(Long, String)]
    val boiler = "same boilerplate text repeated verbatim on every single page here"
    val q = StreamingOps.streamingNearDupCandidates(
        input.toDF().toDF("doc_id", "text"),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("snear").outputMode("append").start()
    input.addData(
      (1L, boiler), (2L, boiler),
      (5L, "completely different text about spark engines and vector indexes now"))
    q.processAllAvailable()
    // new copy in a LATER batch must pair against the remembered rep (1)
    input.addData((7L, boiler))
    q.processAllAvailable()
    val got = spark.sql("SELECT id_a, id_b, est_jaccard FROM snear").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    val pairs = got.map(p => (p._1, p._2)).distinct.sorted.toSeq
    assert(pairs == Seq((1L, 2L), (1L, 7L))) // star around rep; doc 5 never pairs
    assert(got.forall(_._3 == 1.0))          // identical signatures
    // every pair is rep-anchored: candidate count is linear in bucket size
    assert(got.forall(_._1 == 1L))
  }

  // r5 verdict #8: state must not grow with every bucket ever occupied —
  // an idle bucket's representative is evicted on the processing-time
  // timeout, so a later copy becomes a fresh rep instead of pairing.
  test("idle bucket representatives are evicted after the idle timeout") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val input = MemoryStream[(Long, String)]
    val boiler = "same boilerplate text repeated verbatim on every single page here"
    val q = StreamingOps.streamingNearDupCandidates(
        input.toDF().toDF("doc_id", "text"), idleTimeout = "50 milliseconds")
      .writeStream.format("memory").queryName("snear_evict").outputMode("append").start()
    def awaitTrue(what: String)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    input.addData((1L, boiler))
    awaitTrue("batch 1 processed")(q.recentProgress.exists(_.numInputRows > 0))
    Thread.sleep(2000) // idle timeout elapses; a no-data micro-batch evicts rep 1
    input.addData((2L, boiler), (3L, boiler))
    awaitTrue("post-eviction pair emitted")(
      spark.sql("SELECT * FROM snear_evict").count() > 0)
    val pairs = spark.sql("SELECT id_a, id_b FROM snear_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.sorted.toSeq
    q.stop()
    // rep 1 was evicted: 2 became the fresh representative; had state been
    // unbounded the pairs would be (1,2) and (1,3)
    assert(pairs == Seq((2L, 3L)), s"got $pairs")
  }

  // r5 verdict #4: a micro-batch must cost O(batch), not a rewrite of the
  // whole stored index — batches land as delta sidecars of the unchanged
  // base version and fold on the compactEvery cadence.
  test("incrementalIndex appends O(batch) deltas and folds on the cadence") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-delta").toString
    val indexPath = s"$tmp/idx"
    val input = MemoryStream[(Long, String, String)]
    val config = IndexConfig("sd", "id", Seq(EmbeddingField("title", important = true),
      EmbeddingField("body")), tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val q = StreamingOps.incrementalIndex(
      input.toDF().toDF("id", "title", "body"), config, HashEmbeddingBackend(16),
      "page", "id", indexPath, s"$tmp/chk", compactEvery = 3)
    val vd = new graft.api.VersionedDir(spark, indexPath)
    input.addData((1L, "T1", "first page body"))
    q.processAllAvailable()
    assert(vd.currentVersion.contains("v00001") && vd.listDeltas.isEmpty) // first write = base
    input.addData((2L, "T2", "second page body"))
    q.processAllAvailable()
    // batch 2 is a delta sidecar: base version UNCHANGED (no index rewrite)
    assert(vd.currentVersion.contains("v00001") && vd.listDeltas.size == 1)
    // reader merges base + delta
    assert(graft.pipeline.IndexBuild.readIndex(spark, indexPath).count() == 2)
    // update object 1 in a delta; merge-on-read resolves new-wins
    input.addData((1L, "T1", "first page body CHANGED"))
    q.processAllAvailable()
    assert(vd.currentVersion.contains("v00001") && vd.listDeltas.size == 2)
    val merged = graft.pipeline.IndexBuild.readIndex(spark, indexPath)
    assert(merged.count() == 2)
    assert(merged.filter(array_contains(col("object_keys"), "page:1"))
      .select("content").as[String].head().contains("CHANGED"))
    // third delta hits compactEvery=3 → folds into a fresh base version
    input.addData((3L, "T3", "third page body"))
    q.processAllAvailable()
    q.stop()
    assert(vd.currentVersion.exists(_ != "v00001") && vd.listDeltas.isEmpty)
    assert(graft.pipeline.IndexBuild.readIndex(spark, indexPath).count() == 3)
  }

  test("incrementalIndex(VectorIndex) keeps the ANN side index current per batch") {
    import graft.api.{SearchMode, VectorIndex}
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-ann").toString
    val config = IndexConfig("sann", "id", Seq(EmbeddingField("body")),
      tokenLimit = 64, chunkOverlap = 8, dims = 16)
    val idx = new VectorIndex(spark, config, HashEmbeddingBackend(16),
      graft.embed.EchoChatBackend(), s"$tmp/idx", "page", "id",
      ann = Seq(SearchMode.Lsh(bits = 4, maxHamming = 1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.incrementalIndex(
      input.toDF().toDF("id", "body"), idx, s"$tmp/chk")
    input.addData((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
    q.processAllAvailable()
    // full-width ANN search (Hamming ball = all buckets) sees batch 1
    val hit1 = idx.search("alpha beta gamma", k = 1, threshold = -1.0,
      mode = SearchMode.Lsh(4, 4))
    assert(hit1.select("key").as[String].head() == "page:1")
    input.addData((3L, "eta theta iota"))
    q.processAllAvailable()
    q.stop()
    val keys = idx.search("eta theta iota", k = 3, threshold = -1.0,
      mode = SearchMode.Lsh(4, 4)).select("key").as[String].collect().toSet
    assert(keys.contains("page:3")) // ANN structure refreshed by the batch
  }
}
