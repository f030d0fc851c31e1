package graft.embed

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.textfn

class ChatStreamSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("chatStream default yields the whole response as one chunk; echo streams parts") {
    val msgs = Seq(ChatMessage("system", "ctx"), ChatMessage("user", "q"))
    val fixed = FixedChatBackend("resp")
    assert(fixed.chatStream(msgs).toSeq == Seq("resp"))
    val echo = EchoChatBackend()
    val chunks = echo.chatStream(msgs).toSeq
    assert(chunks.size == 3 && chunks.mkString == echo.chat(msgs))
  }
}

class EmbeddingBackendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hash embedder is deterministic and L2-normalized") {
    val b = HashEmbeddingBackend(32)
    val v1 = b.embedOne("spark vector engine")
    val v2 = b.embedOne("spark vector engine")
    assert(v1.toSeq == v2.toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // different text → different vector
    assert(b.embedOne("other words entirely").toSeq != v1.toSeq)
  }

  test("embedOne rejects empty input like the reference") {
    val b = HashEmbeddingBackend(8)
    intercept[IllegalArgumentException] { b.embedOne("") }
  }

  test("EmbedStage.embed appends vectors partition-locally in batches") {
    val df = (1 to 250).map(i => (i.toLong, s"doc number $i content")).toDF("id", "text")
      .repartition(3)
    val out = EmbedStage.embed(df, "text", HashEmbeddingBackend(16), batchSize = 100)
    assert(out.count() == 250)
    val row = out.filter(col("id") === 7).select("vector").head().getSeq[Float](0)
    assert(row == HashEmbeddingBackend(16).embedOne("doc number 7 content").toSeq)
  }

  test("hash embedder matches its relational (SQL-oracle) formulation") {
    // unnormalized bucket weights computed via DataFrame column ops must equal
    // the backend's accumulation (pre-normalization)
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark spark spark vector"))
    val df = texts.toDF("doc_id", "text")
    val dims = 64
    val rel = df.select(col("doc_id"), explode(textfn.words(col("text"))).as("w"))
      .withColumn("bucket", textfn.hexhash32(col("w")) % dims)
      .withColumn("sign", when(org.apache.spark.sql.functions.conv(
        substring(md5(col("w")), 9, 2), 16, 10).cast("long").bitwiseAND(lit(1L)) === 1L, -1L).otherwise(1L))
      .groupBy("doc_id", "bucket").agg(sum("sign").as("weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2)).toMap

    val backend = HashEmbeddingBackend(dims)
    for ((id, text) <- texts) {
      val v = backend.embedOne(text)
      // norm of the UNNORMALIZED weight vector, reconstructed from the
      // relational weights (the backend normalizes before returning)
      val norm = math.sqrt(rel.collect { case ((d, _), w) if d == id => w.toDouble * w }.sum)
      for (bucket <- 0 until dims) {
        val expected = rel.getOrElse((id, bucket), 0L).toDouble / norm
        assert(math.abs(v(bucket) - expected) < 1e-4, s"doc $id bucket $bucket: ${v(bucket)} vs $expected")
      }
    }
  }
}
