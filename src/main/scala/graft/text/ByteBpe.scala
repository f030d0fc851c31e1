package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.textkernel._

/** Byte-level BPE — the GPT-2 / tiktoken tokenizer class (Radford et al.
  * 2019 "Language Models are Unsupervised Multitask Learners"; the
  * published GPT-2 encoder defines the three pieces reproduced here:
  * the bytes→printable-unicode alphabet, the pretokenizer regex, and
  * rank-ordered pair merges over byte symbols). This is the tokenizer
  * modern LLM pipelines actually run: it has NO unknown token by
  * construction (every input is a byte sequence and all 256 bytes are
  * base symbols), round-trips arbitrary text exactly, and treats the
  * leading space as part of the word (" the" ≠ "the" — the Ġ
  * convention). The reference's token accounting stops at estimator
  * heuristics (ai_utils/text_splitting/naive.py:31-55), so this is a
  * training-pipeline extension like [[Bpe]], not a port.
  *
  * Scale shape (inherited from [[Bpe]], same discipline):
  *  - the ONLY corpus-wide pass is the pretoken-frequency aggregation
  *    ([[pretokenCounts]]): compiled pretokenizer kernel → explode →
  *    map-side-combined groupBy. One row per distinct pretoken per task
  *    crosses the shuffle at any corpus size.
  *  - merge training runs on the collected PRETOKEN vocabulary, bounded
  *    by the same distributed top-`maxVocab` frequency prune (loud-abort
  *    by default) — the driver never holds more than maxVocab + 1 rows.
  *  - encoding is a compiled per-row kernel ([[graft.functions.textkernel
  *    .bbpe_tokens]]) with the merge table broadcast in the plan and a
  *    per-executor pretoken→tokens memo (Zipf hit rates make the apply
  *    loop ~O(distinct pretokens) per partition, not O(tokens)).
  */
object ByteBpe {

  /** GPT-2 bytes_to_unicode: the printable latin-1 bytes (33–126,
    * 161–172, 174–255) map to themselves; the remaining 68 bytes map to
    * 256+k in increasing byte order — every byte gets a DISTINCT
    * printable char, so merge symbols never contain whitespace or
    * control characters (space → 'Ġ' U+0120, newline → 'Ċ' U+010A).
    */
  val byteChar: Array[Char] = {
    val out = new Array[Char](256)
    var k = 0
    var b = 0
    while (b < 256) {
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255))
        out(b) = b.toChar
      else { out(b) = (256 + k).toChar; k += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteChar]] (the mapping is injective by construction). */
  val charByte: Map[Char, Int] =
    byteChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Pretokenize with the published GPT-2 pattern (contractions, then
    * space-prefixed letter/digit/punctuation runs, then whitespace runs).
    * Compiled kernel — see [[graft.functions.TextKernel.gpt2Pretokens]].
    */
  def pretokenize(s: String): Array[String] =
    graft.functions.TextKernel.gpt2Pretokens(s)

  /** Initial byte-symbol sequence of a pretoken: UTF-8 bytes, each mapped
    * through [[byteChar]] — one single-char symbol per byte (a non-ASCII
    * char contributes one symbol per UTF-8 byte). No end-of-word marker:
    * GPT-2 carries word boundaries in the Ġ space prefix instead.
    */
  def toSymbols(pretoken: String): Array[String] = {
    val bytes = pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(byteChar(bytes(i) & 0xff))
      i += 1
    }
    out
  }

  /** Exact inverse of encode: concatenate token symbols, map each char
    * back to its byte, UTF-8-decode. Total on any encode output (every
    * symbol char is in [[charByte]]'s domain by construction).
    */
  def decode(tokens: Seq[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    for (t <- tokens; ch <- t) bos.write(charByte(ch))
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Distributed pretoken-frequency table — the one corpus-wide pass. */
  def pretokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(gpt2_pretokens(col(textCol))).as("pretoken"))
      .groupBy("pretoken").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` byte-level merges over the corpus: the [[Bpe]]
    * merge loop (same pair statistics, same (count desc, pair asc)
    * tie-break, same left-to-right greedy apply) on the byte
    * symbolization of the bounded pretoken vocabulary.
    */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
            minCount: Long = 2L, maxVocab: Int = 4_000_000,
            strict: Boolean = true): Seq[Bpe.Merge] = {
    require(numMerges >= 0, s"numMerges must be non-negative: $numMerges")
    require(maxVocab > 0 && maxVocab < Int.MaxValue,
      s"ByteBpe.train: maxVocab must be in [1, Int.MaxValue): $maxVocab")
    val rows = pretokenCounts(docs, textCol)
      .orderBy(desc("cnt"), asc("pretoken")).limit(maxVocab + 1).collect()
    if (rows.length > maxVocab) {
      val msg = s"ByteBpe.train: pretoken vocabulary exceeds maxVocab=$maxVocab" +
        (if (strict) "; raise the cap or pre-filter the corpus"
         else s" — pruned to the top $maxVocab by (count desc, pretoken asc)")
      if (strict) throw new IllegalArgumentException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    val vocab = rows.iterator.take(maxVocab)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromVocab(vocab, numMerges, minCount)
  }

  /** The driver-side merge loop on an explicit (pretoken, count)
    * vocabulary — byte symbolization, no end-of-word marker.
    */
  def trainFromVocab(vocab: Seq[(String, Long)], numMerges: Int,
                     minCount: Long = 2L): Seq[Bpe.Merge] =
    Bpe.trainFromSyms(vocab.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(toSymbols(w)), c)
    }, numMerges, minCount)

  /** Encode one pretoken with a rank table (keys "a b", lowest rank
    * merges first — [[Bpe.encodeSyms]]).
    */
  def encodePretoken(pretoken: String,
                     ranks: java.util.HashMap[String, Int]): Array[String] =
    Bpe.encodeSyms(toSymbols(pretoken), ranks)

  /** Build the rank table for [[encodePretoken]]. */
  def ranksOf(merges: Seq[Bpe.Merge]): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case (mg, r) => m.putIfAbsent(mg.a + " " + mg.b, r) }
    m
  }

  /** Apply learned merges over a corpus: per document, the concatenated
    * byte-BPE token stream (pretokens in order, each encoded to its
    * merged byte symbols) plus the token count. One compiled kernel
    * pass, no shuffle; round-trips through [[decode]] exactly.
    */
  def encode(docs: DataFrame, merges: Seq[Bpe.Merge],
             textCol: String = "text"): DataFrame = {
    val toks = bbpe_tokens(col(textCol), merges.map(m => (m.a, m.b)))
    docs.select(col("doc_id"), toks.as("bbpe_tokens"))
      .withColumn("n_tokens_bbpe", size(col("bbpe_tokens")).cast("long"))
  }
}
