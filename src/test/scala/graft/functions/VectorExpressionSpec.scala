package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.vector._

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na * nb == 0) 0.0 else dot / (na * nb)
  }

  val rows: Seq[(Seq[Float], Seq[Float])] = {
    val rnd = new scala.util.Random(1)
    (1 to 50).map(_ => (Seq.fill(16)(rnd.nextFloat() - 0.5f), Seq.fill(16)(rnd.nextFloat() - 0.5f)))
  }

  test("cosine/dot/l2 match reference math (interpreted + codegen paths)") {
    val df = rows.toDF("a", "b")
      .select(vec_cosine($"a", $"b").as("cos"), vec_dot($"a", $"b").as("dot"),
        vec_l2($"a", $"b").as("l2"), vec_norm($"a").as("na"), $"a", $"b")
    val got = df.collect()
    got.foreach { r =>
      val a = r.getSeq[Float](4); val b = r.getSeq[Float](5)
      assert(math.abs(r.getDouble(0) - refCosine(a, b)) < 1e-12)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(r.getDouble(1) - dot) < 1e-12)
      val l2 = math.sqrt(a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum)
      assert(math.abs(r.getDouble(2) - l2) < 1e-12)
      assert(math.abs(r.getDouble(3) - math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)) < 1e-12)
    }
  }

  test("cosine bounds, self-similarity, zero-vector convention") {
    val df = rows.toDF("a", "b")
    val selfCos = df.select(vec_cosine($"a", $"a")).as[Double].collect()
    assert(selfCos.forall(c => math.abs(c - 1.0) < 1e-12))
    val cos = df.select(vec_cosine($"a", $"b")).as[Double].collect()
    assert(cos.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
    val zero = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(vec_cosine($"a", $"b")).as[Double].head()
    assert(zero == 0.0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(vec_cosine($"a", $"b")).head().isNullAt(0))
  }

  test("SQL registration via GraftExtensions") {
    rows.toDF("a", "b").createOrReplaceTempView("vt")
    val n = spark.sql("SELECT vec_cosine(a, b) AS c, vec_l2(a, b), vec_dot(a, b), vec_norm(a) FROM vt")
      .filter($"c".isNotNull).count()
    assert(n == 50)
  }

  test("text kernels registered for SQL (literal config args parameterize the kernel)") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("tt")
    val row = spark.sql(
      """SELECT minhash_sig(text, 8, 3) AS mh, simhash(text, 16) AS sh,
        |  token_stats(text) AS ts, word_shingles(text, 3) AS ws,
        |  winnow_fp(text) AS fp,
        |  jaccard_sorted(shingle_hashes(text, 3), shingle_hashes(text, 3)) AS j,
        |  repetition_stats(text) AS rep
        |FROM tt""".stripMargin).head()
    assert(row.getSeq[Long](0).length == 8)
    assert(row.getStruct(2).getLong(1) == 9L) // whitespace token count
    assert(row.getDouble(5) == 1.0)
    // 9 words, 8 distinct ("the" twice), 8 bigrams all distinct
    assert(row.getStruct(6).getLong(0) == 9L && row.getStruct(6).getLong(1) == 8L &&
      row.getStruct(6).getLong(3) == 1L)
    // lsh_bucket on a float array column, with the rotation offset arg
    Seq((1L, Seq(1f, -2f, 3f, -4f))).toDF("id", "v").createOrReplaceTempView("vv")
    val b = spark.sql("SELECT lsh_bucket(v, 4, 8) AS b0, lsh_bucket(v, 4, 8, 8) AS b1 FROM vv").head()
    assert(!b.isNullAt(0) && !b.isNullAt(1))
    // non-literal config arg is rejected loudly
    val err = intercept[Exception](
      spark.sql("SELECT minhash_sig(text, CAST(id AS INT), 3) FROM tt").head())
    assert(err.getMessage.contains("literal"), err.getMessage)
    // round-10 registrations: dsir_buckets multiset (2n−1 features for n
    // words), bq_hamming over binary codes
    val db = spark.sql("SELECT dsir_buckets(text, 64) AS f FROM tt").head()
    assert(db.getSeq[Long](0).length == 17) // 9 unigrams + 8 bigrams
    assert(db.getSeq[Long](0).forall(b => b >= 0 && b < 64))
    val hm = spark.sql(
      "SELECT bq_hamming(CAST('ab' AS BINARY), CAST('ac' AS BINARY)) AS h").head()
    // 'b'(0x62) xor 'c'(0x63) = 0x01 → 1 differing bit
    assert(hm.getInt(0) == 1)
  }

  test("interpreted eval matches codegen result") {
    // force interpreted path through the expression's eval directly
    val a = rows.head._1; val b = rows.head._2
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    def arrLit(x: Seq[Float]) =
      Literal(ArrayData.toArrayData(x.toArray), ArrayType(FloatType, containsNull = false))
    val interp = CosineSimilarity(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
    assert(math.abs(interp - refCosine(a, b)) < 1e-12)
  }
}
