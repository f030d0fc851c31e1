package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): round-17 scaling measurements.
  *
  * Sections (`SPARK_GRAFT_SCALING_SECTIONS=kncurve`, default all):
  *
  *  - **kncurve** — the r16 verdict's missing decade curve for the
  *    interpolated Kneser-Ney trigram LM (the new top-3 bench family):
  *    [[graft.ops.FullText.trigramSurprisalKN]] on a ZIPF-distributed
  *    corpus at 1×/10×/100×, reporting per scale
  *      - the type-table/instance ratio (the heavy term: every count
  *        table is an agg of the trigram TYPE table, so Zipf repetition
  *        is exactly what amortizes the LM-side shuffles), and
  *      - the doc-side join reduction (instances / per-doc distinct
  *        trigram rows — the r15 bigram pre-aggregation figure, 6.17×,
  *        re-measured for trigrams on a Zipf corpus),
  *    plus wall time, so the growth exponent is measured rather than
  *    extrapolated from the bigram result. The sf0.1 bench corpus is
  *    LOW-repetition (type table ≈ instance table — the WORST case);
  *    this section supplies the Zipf-shaped counterpoint real crawl
  *    text exhibits.
  *
  *  Corpus: docs of `SPARK_GRAFT_KN_TOKENS_PER_DOC` (default 200)
  *  tokens built from 4-word PHRASES drawn log-uniformly over a bank
  *  of `SPARK_GRAFT_KN_PHRASES` (default 200k) — inverse-CDF Zipf(1)
  *  sampling via xxhash64(doc, slot), fully deterministic and
  *  executor-side generated. Phrase repetition is what gives real
  *  text its repeated TRIGRAMS (independent unigram-Zipf draws do
  *  not: a pilot run measured trigram type/instance ≈ 1.0 even with
  *  Zipf words, because collocation — not word frequency — is where
  *  n-gram mass concentrates); within-phrase trigrams form the Zipf
  *  head, cross-phrase boundary trigrams the combinatorial tail, so
  *  the corpus exhibits both regimes the LM build must survive.
  *  Phrase words map into a 50k vocabulary mirroring a lang-ID'd
  *  crawl shard.
  */
object Round17Scaling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sections = sys.env.getOrElse("SPARK_GRAFT_SCALING_SECTIONS", "kncurve")
      .split(",").map(_.trim).toSet

    if (sections("kncurve")) {
      val baseDocs = sys.env.getOrElse("SPARK_GRAFT_KN_DOCS", "2000").toLong
      val tokensPerDoc = sys.env.getOrElse("SPARK_GRAFT_KN_TOKENS_PER_DOC", "200").toInt
      val vocab = sys.env.getOrElse("SPARK_GRAFT_KN_VOCAB", "50000").toInt
      val phraseBank = sys.env.getOrElse("SPARK_GRAFT_KN_PHRASES", "200000").toInt
      val scales = sys.env.getOrElse("SPARK_GRAFT_KN_SCALES", "1,10,100")
        .split(",").map(_.trim.toInt).toSeq
      val nSlots = tokensPerDoc / 4
      // phrase rank = Zipf(1) inverse CDF (log-uniform) on
      // xxhash64(doc, slot); phrase p expands to the fixed 4 words
      // w((p*37 + j*13) % V) — deterministic, regenerates identically
      def corpus(nDocs: Long) =
        spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(nSlots - 1)),
            slot => {
              val u = (pmod(xxhash64(col("doc_id"), slot), lit(1000000L))
                .cast("double") + lit(0.5)) / lit(1000000.0)
              val p = floor(exp(u * lit(math.log(phraseBank.toDouble))))
                .cast("long")
              concat_ws(" ", (0 until 4).map(j =>
                concat(lit("w"), pmod(p * lit(37L) + lit(j * 13L), lit(vocab.toLong)))): _*)
            })).as("text"))
      for (s <- scales) {
        val nDocs = baseDocs * s
        val docs = corpus(nDocs).localCheckpoint(true)
        // corpus shape: instances vs trigram types vs per-doc distinct rows
        val tris = docs.select(col("doc_id"),
          explode(graft.functions.textkernel.word_trigrams(col("text"))).as("t"))
          .select(col("doc_id"), col("t.w1"), col("t.w2"), col("t.w3"))
        val instances = tris.count()
        val typeCounts = tris.groupBy("w1", "w2", "w3").count()
          .agg(count(lit(1)).as("types"),
            sum(when(col("count") >= 2, 1L).otherwise(0L)).as("kept2")).collect()(0)
        val types = typeCounts.getLong(0)
        val kept2 = typeCounts.getLong(1) // minCount=2 pruned-LM rows
        val docTris = tris.distinct().count()
        val t0 = System.nanoTime()
        val out = graft.ops.FullText.trigramSurprisalKN(docs)
          .agg(sum("n_trigrams"), sum("avg_neg_logp")).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[r17kncurve] scale=${s}%d docs=$nDocs%d instances=$instances%d " +
          f"types=$types%d typeRatio=${instances.toDouble / types}%.2f " +
          f"minCount2Rows=$kept2%d lmShrink=${1.0 - kept2.toDouble / types}%.2f " +
          f"docTrisRows=$docTris%d docJoinReduction=${instances.toDouble / docTris}%.2f " +
          f"sumTrigrams=${out.getLong(0)}%d time=$secs%.1fs")
        docs.unpersist()
      }
    }
    spark.stop()
  }
}
