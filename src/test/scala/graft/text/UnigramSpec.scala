package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.text.Unigram.Model

/** Unigram-LM tokenizer (Kudo 2018): Viterbi optimality against brute-force
  * enumeration, hand-derived goldens, EM monotonicity, prune coverage, and
  * the compiled encode kernel's equivalence to the driver Viterbi.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def m(pairs: (String, Double)*): Model =
    Model(pairs.map { case (p, pr) => p -> math.round(math.log(pr) * 1e6) }.toMap, 4)

  test("hand-derived goldens: single-piece vs split decided by probability") {
    // p(ab) > p(a)p(b) -> whole piece wins
    val m1 = m("ab" -> 0.4, "a" -> 0.3, "b" -> 0.3)
    assert(Unigram.viterbi("ab", m1).toSeq == Seq("ab"))
    // p(xy) << p(x)p(y) -> split wins
    val m2 = m("xy" -> 0.05, "x" -> 0.4, "y" -> 0.4, "a" -> 0.15)
    assert(Unigram.viterbi("xy", m2).toSeq == Seq("x", "y"))
    // Kudo §3-style lattice: "hello" with strong subwords segments as he/llo
    val m3 = m("he" -> 0.3, "llo" -> 0.3, "hell" -> 0.1, "o" -> 0.05,
      "h" -> 0.05, "e" -> 0.05, "l" -> 0.1, "hello" -> 0.001)
    assert(Unigram.viterbi("hello", m3).toSeq == Seq("he", "llo"))
  }

  test("viterbi equals brute-force best segmentation on every short word") {
    val vocab = Seq("a" -> 0.12, "b" -> 0.1, "ab" -> 0.15, "ba" -> 0.08,
      "aa" -> 0.2, "bb" -> 0.05, "aba" -> 0.2, "abab" -> 0.1)
    val model = m(vocab: _*)
    def brute(w: String): (Long, Seq[String]) = {
      // enumerate all segmentations; max total score with the smallest-
      // first-split tie-break mirrors viterbi's smallest-j convention
      def go(i: Int): Seq[(Long, List[String])] =
        if (i == w.length) Seq((0L, Nil))
        else (1 to math.min(4, w.length - i)).flatMap { l =>
          val piece = w.substring(i, i + l)
          model.scores.get(piece).toSeq.flatMap(sc =>
            go(i + l).map { case (s, ps) => (s + sc, piece :: ps) })
        }
      go(0).maxBy { case (s, ps) => (s, -ps.headOption.map(_.length).getOrElse(0)) } match {
        case (s, ps) => (s, ps)
      }
    }
    val words = for {
      len <- 1 to 6
      n <- 0 until (1 << len)
    } yield (0 until len).map(i => if (((n >> i) & 1) == 0) 'a' else 'b').mkString
    words.foreach { w =>
      val got = Unigram.viterbi(w, model)
      val (bs, _) = brute(w)
      val gotScore = got.map(p => model.scores.getOrElse(p, Unigram.UnkScore)).sum
      assert(gotScore == bs, s"word $w: viterbi score $gotScore != brute $bs (${got.toSeq})")
    }
  }

  test("EM never decreases corpus likelihood and renormalizes expectations") {
    val vocab = Seq(("international", 20L), ("internet", 15L), ("nation", 10L),
      ("intern", 5L), ("rational", 5L), ("ion", 3L))
    var model = Unigram.seedModel(vocab, maxPieceLen = 4, seedSize = 50)
    var ll = Unigram.logLikelihood(vocab, model)
    (1 to 3).foreach { _ =>
      model = Unigram.emStep(vocab, model)
      val next = Unigram.logLikelihood(vocab, model)
      assert(next >= ll - 1e-6, s"EM decreased likelihood: $ll -> $next")
      ll = next
    }
    // probabilities renormalize: sum of exp(score) ≈ 1
    val mass = model.scores.values.map(s => math.exp(s / 1e6)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"probability mass $mass")
  }

  test("train prunes to the target size but never drops single characters") {
    val vocab = Seq(("banana", 10L), ("bandana", 8L), ("cabana", 5L))
    val chars = vocab.flatMap(_._1.toSeq).distinct.map(_.toString).toSet
    val model = Unigram.trainFromVocab(vocab, vocabSize = chars.size + 3,
      maxPieceLen = 4, seedSize = 100, emIters = 1)
    assert(model.scores.size <= chars.size + 3)
    // every char of the training corpus survives pruning (total coverage)
    chars.foreach(c => assert(model.scores.contains(c), s"char $c pruned"))
    // and every training word still encodes without the unk fallback
    vocab.foreach { case (w, _) =>
      assert(Unigram.viterbi(w, model).forall(model.scores.contains), w)
    }
  }

  test("encode kernel matches driver viterbi per word and counts pieces") {
    val docs = Seq((1L, "banana bandana"), (2L, "cabana banana")).toDF("doc_id", "text")
    val model = Unigram.trainFromVocab(
      Seq(("banana", 10L), ("bandana", 8L), ("cabana", 5L)),
      vocabSize = 12, maxPieceLen = 4, seedSize = 100, emIters = 1)
    val out = Unigram.encode(docs, model).orderBy("doc_id").collect()
    val row1 = out(0).getSeq[String](1)
    val want1 = Unigram.viterbi("banana", model) ++ Unigram.viterbi("bandana", model)
    assert(row1 == want1.toSeq, s"$row1 vs ${want1.toSeq}")
    assert(out(0).getLong(2) == want1.length)
    // kernel is a projection: no exchange in the plan
    val p = Unigram.encode(docs, model).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("train is deterministic across invocations") {
    val vocab = Seq(("alpha", 7L), ("alphabet", 5L), ("bet", 3L))
    val a = Unigram.trainFromVocab(vocab, vocabSize = 15, emIters = 2)
    val b = Unigram.trainFromVocab(vocab, vocabSize = 15, emIters = 2)
    assert(a == b)
  }
}
