package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): round-18 scaling measurements.
  *
  * Sections (`SPARK_GRAFT_SCALING_SECTIONS=xspan,justext`, default both):
  *
  *  - **xspan** — cross-corpus span dedup
  *    ([[graft.ops.Dedup.crossCorpusSpanDedup]]) with a FIXED reference
  *    corpus and the NEW side at 1×/10×/100×: wall time per decade, the
  *    removed-token share (must stay ~constant — the planted-span
  *    fraction is scale-invariant), and the bloom prefilter's measured
  *    selectivity (window rows surviving the probe / total window rows —
  *    the shuffle-width reduction the recurring-ingest posture buys;
  *    ~(planted share + fpp) by construction). The phrase-bank corpus
  *    is the r17 kncurve generator shape: 4-word phrases drawn
  *    log-uniformly (Zipf) from a bank, so window hashes exhibit both a
  *    repeated head and a combinatorial tail like real crawl text.
  *
  *  - **justext** — the row-local jusText kernel
  *    ([[graft.ops.Justext.goodText]] via `justext_text`) on
  *    gate-shaped synthetic pages at 1×/10×: pages/sec must hold flat
  *    (pure scan-speed projection, no exchange — the property that lets
  *    `Crawl.ingest(blockBoilerplate = true)` keep its one-exchange
  *    plan).
  */
object Round18Scaling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sections = sys.env.getOrElse("SPARK_GRAFT_SCALING_SECTIONS", "xspan,justext")
      .split(",").map(_.trim).toSet

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    if (sections("xspan")) {
      val nRef = sys.env.getOrElse("SPARK_GRAFT_XSPAN_REF_DOCS", "2000").toLong
      val baseNew = sys.env.getOrElse("SPARK_GRAFT_XSPAN_NEW_DOCS", "1000").toLong
      val scales = sys.env.getOrElse("SPARK_GRAFT_XSPAN_SCALES", "1,10,100")
        .split(",").map(_.trim.toInt).toSeq
      val nSlots = 50 // 200 tokens/doc
      val phraseBank = 200000
      val vocab = 50000
      val w = 20
      // slot phrase for a (seed, slot) pair — the r17 kncurve generator
      def slotPhrase(seed: org.apache.spark.sql.Column, slot: org.apache.spark.sql.Column) = {
        val u = (pmod(xxhash64(seed, slot), lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
        val p = floor(exp(u * lit(math.log(phraseBank.toDouble)))).cast("long")
        concat_ws(" ", (0 until 4).map(j =>
          concat(lit("w"), pmod(p * lit(37L) + lit(j * 13L), lit(vocab.toLong)))): _*)
      }
      def refCorpus = spark.range(nRef).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(nSlots - 1)),
          slot => slotPhrase(col("id"), slot))).as("text"))
      // 10% of NEW docs open with a 28-token span copied VERBATIM from
      // ref doc (doc_id % nRef) (slots 0-6 share the ref's seed); all
      // other slots draw from a disjoint seed space
      def newCorpus(n: Long) = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(nSlots - 1)),
          slot => when(col("id") % 10 === 0 && slot < 7,
              slotPhrase(pmod(col("id"), lit(nRef)), slot))
            .otherwise(slotPhrase(col("id") + lit(1000000000L), slot)))).as("text"))
      val ref = refCorpus.cache()
      ref.count()
      val (fb, tBloom) = timed(graft.ops.Dedup.buildSpanBloom(ref, w,
        expectedItems = nRef * 200, fpp = 0.01))
      println(f"r18xspan bloom build: ${tBloom}%.1fs, ${fb.length} bytes")
      for (s <- scales) {
        val nw = newCorpus(baseNew * s).cache()
        val totalWins = nw.select(org.apache.spark.sql.functions.explode(
          graft.functions.textkernel.positional_shingle_hashes(col("text"), w)).as("h"))
        val (tot, _) = timed(totalWins.count())
        val (cand, _) = timed(totalWins
          .filter(graft.functions.textkernel.bloom_might_contain(col("h").cast("string"), fb))
          .count())
        val ((nDocs, removed, toks), wall) = timed {
          val out = graft.ops.Dedup.crossCorpusSpanDedup(nw, ref, w,
            refFilterBytes = Some(fb))
          val r = out.agg(count(lit(1)), sum("n_removed"), sum("n_tokens")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        println(f"r18xspan scale=$s docs=$nDocs wall=${wall}%.1fs " +
          f"removedShare=${removed.toDouble / toks}%.4f " +
          f"bloomSelectivity=${cand.toDouble / tot}%.4f (cand=$cand / windows=$tot)")
        nw.unpersist()
      }
      ref.unpersist()
    }

    if (sections("justext")) {
      val base = sys.env.getOrElse("SPARK_GRAFT_JT_DOCS", "20000").toLong
      for (s <- Seq(1, 10)) {
        val n = base * s
        val pages = spark.range(n).select(col("id").as("doc_id"), concat(
          lit("<h1>page "), col("id").cast("string"), lit("</h1><p>"),
          expr("repeat('it is the case that the run was good and ', CAST(5 + id % 2 AS INT))"),
          lit("doc "), col("id").cast("string"), lit(" ends here.</p>"),
          lit("<p>in short yes</p>"),
          lit("<div><a href=\"/a\">home page link text goes here</a> " +
            "<a href=\"/b\">more link text for density</a> go to the next pages now.</div>"),
          lit("<p>tiny note here</p>"),
          lit("<p>the cat and dog ran with mouse on mats they all sat very well here now</p>")
        ).as("html"))
        val (chars, wall) = timed(pages
          .select(graft.functions.textkernel.justext_text(col("html")).as("t"))
          .agg(sum(length(col("t")))).head().getLong(0))
        println(f"r18justext scale=$s pages=$n wall=${wall}%.1fs " +
          f"pagesPerSec=${n / wall}%.0f chars=$chars")
      }
    }
    spark.stop()
  }
}
