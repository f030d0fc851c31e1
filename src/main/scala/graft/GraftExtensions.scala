package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2Norm}
import graft.functions.{JaccardSortedExpr, LshBucketExpr, MinHashSigExpr,
  RepetitionStatsExpr, ShingleHashesExpr, SimHashExpr, TokenStatsExpr,
  WinnowFpExpr, WordShinglesExpr}

/** SparkSessionExtensions entry point: registers the native vector AND text
  * kernel expressions as SQL functions so e.g.
  * `spark.sql("SELECT vec_cosine(a, b), minhash_sig(text, 8, 3)")` works
  * next to the Column API. Config-shaped arguments (dims/bits/counts) must
  * be literals — they parameterize the compiled kernel at plan time. Enable
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    def intArg(es: Seq[Expression], i: Int, name: String): Int = {
      require(i < es.length && es(i).foldable,
        s"$name: argument ${i + 1} must be an integer literal")
      es(i).eval(null) match {
        case n: Number => n.intValue
        case other => throw new IllegalArgumentException(
          s"$name: argument ${i + 1} must be an integer literal, got $other")
      }
    }
    reg("vec_cosine", es => CosineSimilarity(es(0), es(1)))
    reg("vec_dot", es => DotProduct(es(0), es(1)))
    reg("vec_l2", es => L2Distance(es(0), es(1)))
    reg("vec_norm", es => L2Norm(es(0)))
    reg("lsh_bucket", es => LshBucketExpr(es(0),
      intArg(es, 1, "lsh_bucket"), intArg(es, 2, "lsh_bucket"),
      if (es.length > 3) intArg(es, 3, "lsh_bucket") else 0))
    reg("token_stats", es => TokenStatsExpr(es(0)))
    reg("minhash_sig", es => MinHashSigExpr(es(0),
      intArg(es, 1, "minhash_sig"), intArg(es, 2, "minhash_sig")))
    reg("simhash", es => SimHashExpr(es(0), intArg(es, 1, "simhash")))
    reg("word_shingles", es => WordShinglesExpr(es(0), intArg(es, 1, "word_shingles")))
    reg("shingle_hashes", es => ShingleHashesExpr(es(0), intArg(es, 1, "shingle_hashes")))
    reg("jaccard_sorted", es => JaccardSortedExpr(es(0), es(1)))
    reg("winnow_fp", es => WinnowFpExpr(es(0)))
    reg("repetition_stats", es => RepetitionStatsExpr(es(0)))
    reg("dsir_buckets", es => graft.functions.DsirBucketsExpr(es(0),
      intArg(es, 1, "dsir_buckets")))
    reg("bq_hamming", es => graft.functions.BqHammingExpr(es(0), es(1)))
  }
}
