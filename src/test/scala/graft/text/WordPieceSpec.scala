package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.text.WordPiece.Vocab

class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BERT golden: greedy longest-match with ## continuations") {
    // the canonical example from the BERT repo's tokenizer docs
    val v = Vocab(Set("un", "u", "a"), Set("aff", "able", "a", "f", "b", "l", "e", "n"), 4)
    assert(WordPiece.encodeWord("unaffable", v).toSeq == Seq("un", "##aff", "##able"))
    // longest-match-FIRST: prefers un over u even when both match
    assert(WordPiece.encodeWord("un", v).toSeq == Seq("un"))
    // a word with an unmatchable position is [UNK] wholesale, no partial output
    assert(WordPiece.encodeWord("unzip", v).toSeq == Seq(WordPiece.Unk))
  }

  test("trainer uses the likelihood-ratio objective, not raw pair frequency") {
    // pair (x, ##y): count 6, both symbols rare  -> score 6/(6·6)  = 1/6
    // pair (a, ##b): count 10, both symbols common -> score 10/(40·40) ≪ 1/6
    // BPE would merge (a, ##b) first (10 > 6); WordPiece must pick (x, ##y)
    val vocab = Seq(("xy", 6L), ("ab", 10L), ("ac", 15L), ("db", 15L), ("da", 15L))
    val (_, merges) = WordPiece.trainFromVocab(vocab, numMerges = 1)
    assert(merges.head.a == "x" && merges.head.b == "##y",
      s"expected (x, ##y) first, got (${merges.head.a}, ${merges.head.b})")
    // and the merged symbol keeps the left class
    assert(merges.head.merged == "xy")
  }

  test("trained vocabulary encodes its own training words without [UNK]") {
    val vocab = Seq(("hugging", 10L), ("hugs", 8L), ("huge", 6L), ("bugs", 4L))
    val (v, _) = WordPiece.trainFromVocab(vocab, numMerges = 10)
    vocab.foreach { case (w, _) =>
      val enc = WordPiece.encodeWord(w, v)
      assert(!enc.contains(WordPiece.Unk), s"$w -> ${enc.toSeq}")
      // pieces reassemble the word (initial plain, continuations stripped)
      val rebuilt = enc.head + enc.tail.map(_.stripPrefix("##")).mkString
      assert(rebuilt == w, s"$w rebuilt as $rebuilt via ${enc.toSeq}")
    }
  }

  test("seedVocab char coverage is per class: corpus words always encode, class-novel ones UNK") {
    val vocab = Seq(("banana", 5L), ("band", 3L))
    val v = WordPiece.seedVocab(vocab, maxPieceLen = 4, seedSize = 3) // tiny cap
    // every training word's chars appear in their own class positions, so
    // corpus words can never stall even under an aggressive seed cap...
    Seq("banana", "band", "banand").foreach { w => // banand: unseen, covered classes
      assert(!WordPiece.encodeWord(w, v).contains(WordPiece.Unk), w)
    }
    // ...but 'n' never occurs word-initial in the corpus, so a word
    // STARTING with it is [UNK] — the class-specific coverage boundary
    assert(WordPiece.encodeWord("nanab", v).toSeq == Seq(WordPiece.Unk))
  }

  test("encode kernel matches driver encode per word; plan is exchange-free") {
    val docs = Seq((1L, "hugging hugs"), (2L, "huge bugs")).toDF("doc_id", "text")
    val (v, _) = WordPiece.trainFromVocab(
      Seq(("hugging", 10L), ("hugs", 8L), ("huge", 6L), ("bugs", 4L)), numMerges = 6)
    val out = WordPiece.encode(docs, v).orderBy("doc_id").collect()
    val want1 = WordPiece.encodeWord("hugging", v) ++ WordPiece.encodeWord("hugs", v)
    assert(out(0).getSeq[String](1) == want1.toSeq)
    assert(out(0).getLong(2) == want1.length)
    val p = WordPiece.encode(docs, v).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("train is deterministic across invocations") {
    val vocab = Seq(("alpha", 7L), ("alphabet", 5L), ("bet", 3L))
    assert(WordPiece.trainFromVocab(vocab, 8) == WordPiece.trainFromVocab(vocab, 8))
  }
}
