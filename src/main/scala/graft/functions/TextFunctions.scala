package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-level text/hash helpers shared by the text-analysis and dedup
  * operators. Every function here is built from codegen'd Spark built-ins and
  * has an exact ANSI-SQL twin (used by the DuckDB oracle in SparkEntry):
  * MD5 is the cross-engine deterministic hash (identical in any engine),
  * ASCII regex classes match RE2 semantics.
  */
object textfn {

  /** Lower-cased alphanumeric word tokens (empty tokens dropped).
    * SQL twin: list_filter(string_split_regex(lower(t),'[^a-z0-9]+'), w -> w <> '')
    */
  def words(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), w => w =!= lit(""))

  /** 60-bit non-negative hash from the first 15 hex chars of md5.
    * SQL twin: CAST('0x' || substr(md5(s),1,15) AS BIGINT)
    */
  def hexhash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Unsigned 32-bit hash from the first 8 hex chars of md5. */
  def hexhash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Naive token-count estimate — column twin of
    * [[graft.text.NaiveTokenCounter]] (reference naive.py:31-55):
    * ceil(max(ceil(chars/4), ceil(words*0.75))), words = `[^\w\s]|\w+` matches.
    */
  def naiveTokenCount(c: Column): Column =
    ceil(greatest(
      ceil(length(c) / lit(4.0)),
      ceil(size(regexp_extract_all(c, lit("[^\\w\\s]|\\w+"), lit(0))) * lit(0.75))
    )).cast(LongType)

  /** Whitespace token count. */
  def whitespaceTokenCount(c: Column): Column =
    size(split(trim(c), "\\s+"))

  /** BPE-ish pre-tokenizer count: runs of letters, runs of digits, or single
    * non-alnum-non-space chars (RE2-compatible — no lookahead).
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Distinct word n-gram shingles, space-joined; empty when < n words.
    * SQL twin uses range(1, len-n+2) + list_transform.
    */
  def wordShingles(wordsCol: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(wordsCol) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(wordsCol, i + lit(j))): _*))
    array_distinct(when(size(wordsCol) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** MinHash value for seed `seed` over a shingle array: min over shingles of
    * hexhash60(seed || ':' || shingle). NULL when no shingles.
    */
  def minhash(shinglesCol: Column, seed: Int): Column =
    array_min(transform(shinglesCol, s => hexhash60(concat(lit(s"$seed:"), s))))

  /** Exact Jaccard similarity of two string arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** `bits`-bit SimHash over the distinct words of a document: bit j is set
    * iff Σ_w (±1 by bit j of hexhash32(w)) > 0.
    */
  def simhash(wordsCol: Column, bits: Int = 16): Column = {
    val distinctWords = array_distinct(wordsCol)
    val terms = (0 until bits).map { j =>
      val bitSum = aggregate(distinctWords, lit(0),
        (acc, w) => acc + when(shiftright(hexhash32(w), j).bitwiseAND(lit(1L)) === lit(1L), lit(1)).otherwise(lit(-1)))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Hamming distance between two small-int bitmaps. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
