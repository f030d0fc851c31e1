package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.textkernel._

/** Byte-pair-encoding tokenizer training and application over a corpus
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the subword-nmt algorithm; the reference's
  * token accounting stops at estimator heuristics,
  * ai_utils/text_splitting/langchain.py:54-76, so a learned tokenizer is a
  * training-pipeline extension, not a port).
  *
  * Scale shape — the part that must be designed rather than translated:
  *  - the ONLY corpus-wide pass is the word-frequency aggregation
  *    ([[wordCounts]]): explode word tokens, map-side-combined groupBy.
  *    At 100 TB the shuffle carries one row per distinct word per task.
  *  - merge training runs on the collected VOCABULARY (word, count) table,
  *    whose size is bounded by the language, not the corpus (a 100 TB crawl
  *    and a 1 GB crawl both collapse to a few million distinct words).
  *    This is how the original subword-nmt trains; a per-merge distributed
  *    recount would cost `numMerges` shuffles for no added correctness. The
  *    collect is BOUNDED by a distributed top-`maxVocab` frequency prune
  *    ([[topWordCounts]]) — past the cap it loud-aborts by default
  *    (`strict = false` opts into loud-prune), so the driver never holds
  *    more than `maxVocab + 1` rows at any corpus size.
  *  - encoding is a compiled per-row kernel ([[graft.functions.textkernel
  *    .bpe_tokens]]) with the merge table broadcast in the plan — scan
  *    speed, no shuffle, with a per-executor word→tokens memo (word
  *    frequency follows Zipf: the memo hit-rate makes encode ~O(distinct
  *    words) per partition, not O(tokens)).
  */
object Bpe {

  /** End-of-word symbol appended to each word's symbol sequence (the
    * subword-nmt convention: the marker is its OWN symbol, so merges can
    * absorb it — e.g. est + </w> → est</w>).
    */
  val Eow = "</w>"

  /** A learned merge: the adjacent symbol pair, its merged form, and the
    * pair's weighted count when it was selected (monotonically
    * non-increasing across the merge sequence — pinned by BpeSpec).
    */
  final case class Merge(a: String, b: String, count: Long) {
    def merged: String = a + b
  }

  /** Distributed word-frequency table — the one corpus-wide pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(word_tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Top-`cap` rows of [[wordCounts]] by (count desc, word asc) — the
    * DISTRIBUTED prune that bounds every driver-side vocabulary collect.
    * (cnt desc, word asc) is a total order (words are distinct after the
    * groupBy), so the kept set is deterministic at any corpus size; Spark
    * compiles orderBy+limit to TakeOrderedAndProject (per-partition top-cap
    * heaps, driver merges cap rows per partition — never the full table).
    * This is the SentencePiece/WordPiece seeding posture: candidates come
    * from the most frequent words, and at 100 TB the tail of the Zipf
    * distribution contributes nothing to frequency-ranked seeds.
    */
  def topWordCounts(docs: DataFrame, textCol: String = "text",
                    cap: Int = 4_000_000): DataFrame =
    wordCounts(docs, textCol).orderBy(desc("cnt"), asc("word")).limit(cap)

  /** Adjacent-symbol pair counts of the INITIAL (round-0) symbolization —
    * per word: characters plus the trailing [[Eow]] symbol, each adjacent
    * pair weighted by the word's corpus frequency. This is the relational
    * twin of the trainer's first round (pinned equal by BpeSpec) and the
    * oracle-gated surface (q_bpe_pairs): later rounds depend on the merges
    * already chosen and live driver-side by design.
    *
    * The pair explosion runs on the word-frequency table (vocabulary-sized),
    * so the interpreted `transform` lambda is irrelevant to scale — the
    * corpus-sized pass is [[wordCounts]]'s compiled kernel.
    */
  def pairCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordCounts(docs, textCol)
      .select(col("cnt"), explode(expr(
        s"""transform(sequence(1, length(word)), i -> concat(
           |  substring(word, i, 1), ' ',
           |  CASE WHEN i = length(word) THEN '$Eow'
           |       ELSE substring(word, i + 1, 1) END))""".stripMargin)).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("cnt"))

  /** Initial symbol sequence of a word: one symbol per character plus the
    * end-of-word marker.
    */
  def initialSymbols(word: String): Array[String] = {
    val out = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { out(i) = word.substring(i, i + 1); i += 1 }
    out(word.length) = Eow
    out
  }

  /** Train `numMerges` BPE merges over the corpus. Deterministic: each round
    * picks the (count-max, then lexicographically-least (a, b)) adjacent
    * pair — ties never depend on hash order — and stops early when the best
    * pair's weighted count falls below `minCount` (2 by default: merging a
    * pair seen once memorizes a single word).
    */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
            minCount: Long = 2L, maxVocab: Int = 4_000_000,
            strict: Boolean = true): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be non-negative: $numMerges")
    trainFromVocab(collectVocab(docs, textCol, maxVocab, strict, "Bpe.train"),
      numMerges, minCount)
  }

  /** Bounded vocabulary collect shared by the three trainers: the
    * distributed top-(maxVocab+1) prune ([[topWordCounts]]) means the
    * driver NEVER receives more than maxVocab+1 rows regardless of corpus
    * size; the +1 sentinel detects overflow without a second count pass.
    * Default posture is loud-ABORT at the cap (the original contract —
    * training on a silently truncated vocabulary is a correctness hazard);
    * `strict = false` opts into loud-PRUNE (keep the top-maxVocab words by
    * frequency and warn — frequency-ranked pruning is exactly what
    * SentencePiece/WordPiece training does, and real 100 TB vocabularies
    * don't fit any cap).
    */
  private[text] def collectVocab(docs: DataFrame, textCol: String,
                                 maxVocab: Int, strict: Boolean,
                                 who: String): Seq[(String, Long)] = {
    require(maxVocab > 0 && maxVocab < Int.MaxValue,
      s"$who: maxVocab must be in [1, Int.MaxValue): $maxVocab")
    val rows = topWordCounts(docs, textCol, maxVocab + 1).collect()
    if (rows.length > maxVocab) {
      val msg = s"$who: vocabulary exceeds maxVocab=$maxVocab distinct words" +
        (if (strict) "; raise the cap or pre-filter the corpus"
         else s" — pruned to the top $maxVocab by (count desc, word asc)")
      if (strict) throw new IllegalArgumentException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    rows.iterator.take(maxVocab)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The driver-side merge loop on an explicit (word, count) vocabulary. */
  def trainFromVocab(vocab: Seq[(String, Long)], numMerges: Int,
                     minCount: Long = 2L): Seq[Merge] =
    trainFromSyms(vocab.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(initialSymbols(w)), c)
    }, numMerges, minCount)

  /** The merge loop on pre-symbolized words — shared between the
    * subword-nmt char+</w> symbolization above and [[ByteBpe]]'s
    * byte-alphabet symbolization (same pair statistics, same
    * (count desc, pair asc) tie-break, same left-to-right greedy apply).
    */
  private[text] def trainFromSyms(
      words: Seq[(scala.collection.mutable.ArrayBuffer[String], Long)],
      numMerges: Int, minCount: Long): Seq[Merge] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      for ((syms, c) <- words) {
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestCnt = -1L
      counts.forEach { (p, c) =>
        if (c > bestCnt || (c == bestCnt &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCnt = c
        }
      }
      if (best == null || bestCnt < minCount) round = numMerges
      else {
        merges += Merge(best._1, best._2, bestCnt)
        val m = best._1 + best._2
        for ((syms, _) <- words) {
          var i = 0
          while (i + 1 < syms.length) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = m
              syms.remove(i + 1)
            }
            // left-to-right greedy: a merged symbol can immediately pair
            // with the next one only in a LATER round, matching subword-nmt
            i += 1
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Encode one word with a rank table (lowest rank merges first, repeat to
    * fixpoint) — the standard BPE apply loop. `ranks` keys are "a b".
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Int]): Array[String] =
    encodeSyms(initialSymbols(word), ranks)

  /** The rank-table apply loop on an explicit initial symbolization —
    * shared with [[ByteBpe]] (whose symbols are mapped bytes, no `</w>`).
    */
  private[text] def encodeSyms(initial: Array[String],
                               ranks: java.util.HashMap[String, Int]): Array[String] = {
    var syms = initial
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrDefault(syms(i) + " " + syms(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = syms(bestAt) + syms(bestAt + 1)
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, bestAt)
        next(bestAt) = merged
        System.arraycopy(syms, bestAt + 2, next, bestAt + 1, syms.length - bestAt - 2)
        syms = next
      }
    }
    syms
  }

  /** Apply learned merges over a corpus: per document, the concatenated BPE
    * token stream of its words plus the learned-token count. One compiled
    * kernel pass, no shuffle.
    */
  def encode(docs: DataFrame, merges: Seq[Merge],
             textCol: String = "text"): DataFrame = {
    val toks = bpe_tokens(col(textCol), merges.map(m => (m.a, m.b)))
    docs.select(col("doc_id"), toks.as("bpe_tokens"))
      .withColumn("n_tokens_bpe_learned", size(col("bpe_tokens")).cast("long"))
  }
}
