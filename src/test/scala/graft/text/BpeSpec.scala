package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** BPE trainer + encoder: the classic subword-nmt golden (Sennrich et al.
  * 2016 §3.2 worked example), trainer/relational round-0 parity, and the
  * encode kernel's fixpoint behavior.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The paper's vocabulary: low×5, lower×2, newest×6, widest×3. */
  private def sennrichDocs = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("train reproduces the subword-nmt golden merge sequence") {
    val merges = Bpe.train(sennrichDocs, numMerges = 5)
    assert(merges.map(m => (m.a, m.b, m.count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    // selected-pair counts never increase across the sequence
    assert(merges.map(_.count) == merges.map(_.count).sorted.reverse)
  }

  test("trainer round 0 equals the relational pairCounts surface") {
    val rel = Bpe.pairCounts(sennrichDocs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the trainer's first merge must be the relational table's top pair
    // under the same (count desc, pair asc) order
    val topRel = rel.toSeq.sortBy { case (p, c) => (-c, p) }.head
    val first = Bpe.train(sennrichDocs, numMerges = 1).head
    assert(topRel == (s"${first.a} ${first.b}", first.count))
    assert(rel("e s") == 9L && rel("t </w>") == 9L && rel("w e") == 8L)
  }

  test("encodeWord applies merges to fixpoint in rank order") {
    val merges = Bpe.train(sennrichDocs, numMerges = 5)
    val ranks = new java.util.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case (m, r) => ranks.put(s"${m.a} ${m.b}", r) }
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low", "</w>"))
    assert(Bpe.encodeWord("unseen", ranks).toSeq ==
      Seq("u", "n", "s", "e", "e", "n", "</w>")) // no applicable merges
  }

  test("encode kernel: per-document token stream, learned-token count") {
    val merges = Bpe.train(sennrichDocs, numMerges = 5)
    val docs = Seq((1L, "lowest low"), (2L, "")).toDF("doc_id", "text")
    val r = Bpe.encode(docs, merges).collect()
      .map(x => x.getLong(0) -> ((x.getSeq[String](1), x.getLong(2)))).toMap
    assert(r(1L)._1 == Seq("low", "est</w>", "low", "</w>"))
    assert(r(1L)._2 == 4L)
    assert(r(2L) == ((Seq.empty[String], 0L)))
  }

  test("encoding is reversible: concatenated symbols reconstruct the words") {
    val merges = Bpe.train(sennrichDocs, numMerges = 5)
    val ranks = new java.util.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case (m, r) => ranks.put(s"${m.a} ${m.b}", r) }
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "zzz"))
      assert(Bpe.encodeWord(w, ranks).mkString == w + Bpe.Eow)
  }

  test("minCount stops merges that would memorize a single occurrence") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text") // every pair count 1
    assert(Bpe.train(docs, numMerges = 10).isEmpty)
  }

  test("train is deterministic across invocations") {
    val a = Bpe.train(sennrichDocs, numMerges = 8)
    val b = Bpe.train(sennrichDocs, numMerges = 8)
    assert(a == b && a.nonEmpty)
  }

  test("BPE composes with sequence packing: pack by LEARNED token counts") {
    val merges = Bpe.train(sennrichDocs, numMerges = 5)
    // "low" → [low, </w>] = 2 learned tokens; naive estimate would be 1
    val docs = (1L to 10L).map(i => (i, "low lowest newest")).toDF("doc_id", "text")
    val encoded = Bpe.encode(docs, merges) // 2 + 2 + 4 = 8 learned tokens/doc
      .join(docs, "doc_id")
    val packed = graft.ops.TextAnalysis.packSequences(encoded, tokenBudget = 16,
      tokenCol = Some("n_tokens_bpe_learned"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(packed(1L) == ((8L, 0L))) // 8 tokens each, 2 docs per 16-token bin
    assert(packed(2L) == ((8L, 0L)))
    assert(packed(3L) == ((8L, 1L)))
    assert(packed(10L) == ((8L, 4L)))
  }

  test("maxVocab cap fails loudly in strict mode (the default)") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, numMerges = 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
    // degenerate caps are rejected up front (maxVocab + 1 must not overflow)
    intercept[IllegalArgumentException] {
      Bpe.train(docs, numMerges = 1, maxVocab = 0)
    }
    intercept[IllegalArgumentException] {
      Bpe.train(docs, numMerges = 1, maxVocab = Int.MaxValue)
    }
  }

  test("maxVocab overflow loud-prunes to top-maxVocab by frequency (opt-in)") {
    // vocabulary 10x the cap: 30 distinct filler words (each once) + 3 hot
    // words; cap = 3 keeps exactly the hot words, so training matches
    // trainFromVocab on the hand-pruned vocabulary and the driver never
    // sees more than cap+1 rows
    val filler = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    val docs = (1L to 5L).map(i => (i, "low lowest newest"))
      .toDF("doc_id", "text").union(Seq((99L, filler)).toDF("doc_id", "text"))
    assert(Bpe.topWordCounts(docs, cap = 3).collect().length == 3)
    assert(Bpe.topWordCounts(docs, cap = 4).count() == 4L)
    val pruned = Bpe.train(docs, numMerges = 3, maxVocab = 3, strict = false)
    val manual = Bpe.trainFromVocab(
      Seq(("low", 5L), ("lowest", 5L), ("newest", 5L)), numMerges = 3)
    assert(pruned == manual)
    // deterministic tie-break: equal counts rank by word asc
    val top = Bpe.topWordCounts(docs, cap = 5).collect().map(_.getString(0))
    assert(top.take(3).sorted.sameElements(Array("low", "lowest", "newest")))
    assert(top.slice(3, 5).sameElements(Array("w01", "w02")))
  }

  test("WordPiece and Unigram trainers share the bounded-prune posture") {
    val filler = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    val docs = (1L to 5L).map(i => (i, "low lowest newest"))
      .toDF("doc_id", "text").union(Seq((99L, filler)).toDF("doc_id", "text"))
    val hand = Seq(("low", 5L), ("lowest", 5L), ("newest", 5L))
    val (v, m) = graft.text.WordPiece.train(docs, numMerges = 2, maxVocab = 3,
      strict = false)
    assert((v, m) == graft.text.WordPiece.trainFromVocab(hand, numMerges = 2))
    val um = graft.text.Unigram.train(docs, vocabSize = 20, maxVocab = 3,
      strict = false)
    assert(um == graft.text.Unigram.trainFromVocab(hand, vocabSize = 20))
    intercept[IllegalArgumentException] {
      graft.text.WordPiece.train(docs, numMerges = 1, maxVocab = 3, strict = true)
    }
    intercept[IllegalArgumentException] {
      graft.text.Unigram.train(docs, vocabSize = 20, maxVocab = 3, strict = true)
    }
  }
}
