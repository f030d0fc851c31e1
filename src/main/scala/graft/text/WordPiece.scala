package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer, Devlin et al. 2019 — greedy longest-match-first inference
  * with `##` continuation pieces; training objective per the published
  * description: merge the pair maximizing count(ab) / (count(a)·count(b)),
  * BPE's loop with a likelihood-ratio score instead of raw frequency).
  * Third member of the tokenizer family beside [[Bpe]] and [[Unigram]] —
  * same beyond-reference training-pipeline role.
  *
  * Scale shape — identical posture to [[Bpe]]/[[Unigram]]: one distributed
  * word-count pass, training on the bounded driver-side vocabulary,
  * encode as a compiled kernel with the vocab a plan-time constant.
  *
  * Determinism: the trainer compares scores as EXACT cross-multiplied
  * BigInt rationals (count(ab)·count(a')·count(b') vs the mirror — no
  * floating point anywhere), ties break lexicographically; greedy encode
  * has no scores at all (membership + longest-match), so the DuckDB
  * oracle replays it without a rounding convention.
  */
object WordPiece {

  val Unk = "[UNK]"
  val ContPrefix = "##"

  /** A vocabulary: word-initial piece strings and continuation piece
    * strings (stored WITHOUT the `##` prefix; display adds it).
    */
  final case class Vocab(initial: Set[String], cont: Set[String], maxPieceLen: Int)

  /** Frequency-seeded vocabulary (the oracle-gated construction, mirroring
    * [[Unigram.seedModel]]'s role): substrings of length 1..maxPieceLen at
    * word start count as INITIAL candidates, at any later position as
    * CONTINUATION candidates; keep the top `seedSize` by (count desc,
    * display asc) over both classes pooled, PLUS every single character in
    * BOTH classes (coverage: greedy can always advance one char).
    */
  def seedVocab(vocab: Seq[(String, Long)], maxPieceLen: Int = 4,
                seedSize: Int = 200): Vocab = {
    val counts = new java.util.HashMap[(String, Boolean), Long]()
    for ((w, c) <- vocab) {
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          counts.merge((w.substring(i, i + l), i > 0), c, (a, b) => a + b)
          l += 1
        }
        i += 1
      }
    }
    val all = scala.collection.mutable.ArrayBuffer.empty[((String, Boolean), Long)]
    counts.forEach((k, c) => all += ((k, c)))
    def display(k: (String, Boolean)): String = if (k._2) ContPrefix + k._1 else k._1
    val ranked = all.sortBy { case (k, c) => (-c, display(k)) }
    val kept = ranked.take(seedSize) ++
      ranked.drop(seedSize).filter(_._1._1.length == 1)
    Vocab(kept.collect { case ((p, false), _) => p }.toSet,
      kept.collect { case ((p, true), _) => p }.toSet, maxPieceLen)
  }

  /** Greedy longest-match-first encode (the BERT WordPieceTokenizer loop):
    * at each position take the longest vocab piece of the right class; a
    * position with NO match maps the whole word to [[Unk]] (the BERT
    * convention — no partial output).
    */
  def encodeWord(word: String, v: Vocab): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val set = if (pos == 0) v.initial else v.cont
      var l = math.min(v.maxPieceLen, word.length - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        if (set.contains(word.substring(pos, pos + l))) found = l
        l -= 1
      }
      if (found < 0) return Array(Unk)
      out += (if (pos == 0) word.substring(pos, pos + found)
              else ContPrefix + word.substring(pos, pos + found))
      pos += found
    }
    out.toArray
  }

  /** A learned merge with its exact likelihood score (as the rational
    * pairCount / (leftCount · rightCount), kept unreduced for inspection).
    */
  final case class Merge(a: String, b: String, pairCount: Long,
                         leftCount: Long, rightCount: Long) {
    /** Continuation-aware merged form: `un + ##aff = unaff`. */
    def merged: String =
      a + (if (b.startsWith(ContPrefix)) b.substring(ContPrefix.length) else b)
  }

  /** Train `numMerges` merges with the WordPiece objective. Each round
    * scores every adjacent symbol pair as pair/(left·right) and merges the
    * max; score comparison is exact BigInt cross-multiplication, ties
    * break on the lexicographically least (a, b). Symbols carry the BERT
    * surface form: first symbol plain, later symbols `##`-prefixed, so the
    * produced vocabulary is directly a [[Vocab]].
    */
  def trainFromVocab(vocab: Seq[(String, Long)], numMerges: Int,
                     maxPieceLen: Int = 64): (Vocab, Seq[Merge]) = {
    val words = vocab.map { case (w, c) =>
      val syms = scala.collection.mutable.ArrayBuffer.tabulate(w.length)(i =>
        if (i == 0) w.substring(0, 1) else ContPrefix + w.substring(i, i + 1))
      (syms, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < numMerges) {
      val pair = new java.util.HashMap[(String, String), Long]()
      val single = new java.util.HashMap[String, Long]()
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length) {
          single.merge(syms(i), c, (x, y) => x + y)
          if (i + 1 < syms.length) pair.merge((syms(i), syms(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestP, bestL, bestR = 0L
      pair.forEach { (p, pc) =>
        val l = single.get(p._1); val r = single.get(p._2)
        // score(p) > score(best)  ⇔  pc·bestL·bestR > bestP·l·r  (exact)
        val better =
          if (best == null) true
          else {
            val lhs = BigInt(pc) * BigInt(bestL) * BigInt(bestR)
            val rhs = BigInt(bestP) * BigInt(l) * BigInt(r)
            lhs > rhs || (lhs == rhs &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
          }
        if (better) { best = p; bestP = pc; bestL = l; bestR = r }
      }
      if (best == null) round = numMerges
      else {
        merges += Merge(best._1, best._2, bestP, bestL, bestR)
        // merged symbol keeps the LEFT side's class: ##ab + ##c = ##abc,
        // un + ##aff = unaff
        val mergedSym =
          if (best._1.startsWith(ContPrefix))
            ContPrefix + stripCont(best._1) + stripCont(best._2)
          else best._1 + stripCont(best._2)
        for ((syms, _) <- words) {
          var i = 0
          while (i + 1 < syms.length) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = mergedSym
              syms.remove(i + 1)
            }
            i += 1
          }
        }
        round += 1
      }
    }
    val produced = scala.collection.mutable.Set.empty[String]
    for ((syms, _) <- words; s <- syms) produced += s
    val initial = produced.iterator.filterNot(_.startsWith(ContPrefix)).toSet
    val cont = produced.iterator.filter(_.startsWith(ContPrefix))
      .map(stripCont).toSet
    val maxLen = (initial.iterator.map(_.length) ++ cont.iterator.map(_.length))
      .foldLeft(1)(math.max)
    (Vocab(initial, cont, math.min(maxLen, maxPieceLen)), merges.toSeq)
  }

  private def stripCont(s: String): String =
    if (s.startsWith(ContPrefix)) s.substring(ContPrefix.length) else s

  /** Train over a corpus (one word-count pass, bounded driver loop; the
    * [[Bpe.collectVocab]] posture — distributed top-`maxVocab` frequency
    * prune; loud-abort at the cap by default, `strict = false` for
    * loud-prune).
    */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
            maxVocab: Int = 4_000_000,
            strict: Boolean = true): (Vocab, Seq[Merge]) =
    trainFromVocab(
      Bpe.collectVocab(docs, textCol, maxVocab, strict, "WordPiece.train"),
      numMerges)

  /** Greedy-encode a corpus: concatenated piece stream per document plus
    * the learned-token count. One compiled kernel pass.
    */
  def encode(docs: DataFrame, v: Vocab, textCol: String = "text"): DataFrame = {
    val toks = graft.functions.textkernel.wordpiece_tokens(col(textCol), v)
    docs.select(col("doc_id"), toks.as("wp_tokens"))
      .withColumn("n_tokens_wordpiece", size(col("wp_tokens")).cast("long"))
  }
}
