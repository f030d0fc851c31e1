package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.vector._

class SqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 16

  private def vec(id: Long): Seq[Float] =
    (0 until dims).map { i =>
      val h = new scala.util.Random(id * 1000 + i).nextDouble()
      (h * 2 - 1).toFloat
    }

  private lazy val items = (0L until 200L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>"))

  private lazy val params = ScalarQuantization.collectParams(ScalarQuantization.sqTrain(items))

  test("codes are 1 byte/dim; extremes encode to 0 and 255") {
    val (mins, maxs) = params
    val enc = ScalarQuantization.sqEncode(items, mins, maxs)
      .select(col("vec_id"), sq_codes(col("sq")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(enc.values.forall(_.length == dims))
    assert(enc.values.flatten.forall(c => c >= 0 && c <= 255))
    // per dimension, some row attains the min (code 0) and some the max (255)
    (0 until dims).foreach { d =>
      val col = enc.values.map(_(d))
      assert(col.min == 0 && col.max == 255, s"dim $d spans ${col.min}..${col.max}")
    }
  }

  test("sq_adc kernel equals a driver-side dequantize-and-square") {
    val (mins, maxs) = params
    val enc = ScalarQuantization.sqEncode(items, mins, maxs)
    val probe = vec(7L)
    val lut = ScalarQuantization.sqLut(probe, mins, maxs)
    val probeDf = Seq((7L, probe, lut.toSeq)).toDF("qid", "qv", "lut")
    val kernel = enc.crossJoin(broadcast(probeDf.select(col("lut"))))
      .select(col("vec_id"), sq_adc(col("sq"), col("lut")).as("d"))
      .as[(Long, Long)].collect().toMap
    val codes = enc.select(col("vec_id"), sq_codes(col("sq")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    codes.foreach { case (id, cs) =>
      val manual = cs.zipWithIndex.map { case (c, i) =>
        lut(3 * i) - lut(3 * i + 1) * c + lut(3 * i + 2) * c.toLong * c
      }.sum
      assert(kernel(id) == manual, s"vec $id: kernel ${kernel(id)} != manual $manual")
    }
  }

  test("SQ ADC ranking is near-lossless: top-k with rerank matches brute force") {
    val (mins, maxs) = params
    val enc = ScalarQuantization.sqEncode(items, mins, maxs)
    val probes = (0L until 5L).map(i => (i, vec(i)))
    val probeDf = probes.toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    val exact = SimilaritySearch.bruteForceTopK(items, probeDf, k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    // moderate refine: candidates are L2-ranked, rerank is cosine — on
    // non-normalized random vectors the orders differ, so recall tracks the
    // candidate width, not quantization error (same calibration as PqSpec)
    val sq = ScalarQuantization.sqTopK(enc, items, mins, maxs, probes, k = 5, refine = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(sq).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // full-width refine reranks every row exactly ⇒ must EQUAL brute force
    val full = ScalarQuantization.sqTopK(enc, items, mins, maxs, probes, k = 5, refine = 40)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
  }

  test("SQ quantization error is bounded by half a step per dimension") {
    val (mins, maxs) = params
    val enc = ScalarQuantization.sqEncode(items, mins, maxs)
      .select(col("vec_id"), sq_codes(col("sq")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val vecs = items.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    vecs.foreach { case (id, v) =>
      val cs = enc(id)
      (0 until dims).foreach { i =>
        val step = (maxs(i).toDouble - mins(i).toDouble) / 255.0
        val dequant = mins(i).toDouble + cs(i) * step
        // round-to-nearest: |x − dequant| ≤ step/2 (+ ε for the float cast)
        assert(math.abs(v(i).toDouble - dequant) <= step / 2 + 1e-9,
          s"vec $id dim $i: x=${v(i)} dequant=$dequant step=$step")
      }
    }
  }

  test("degenerate dimensions (max = min) encode as 0 and contribute a constant") {
    val flat = (0L until 20L).map(i => (i, Seq.fill(4)(0.25f) ++ vec(i).take(4)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val (mins, maxs) = ScalarQuantization.collectParams(ScalarQuantization.sqTrain(flat))
    assert(mins.take(4).sameElements(maxs.take(4)))
    val codes = ScalarQuantization.sqEncode(flat, mins, maxs)
      .select(sq_codes(col("sq"))).as[Seq[Int]].collect()
    assert(codes.forall(_.take(4).forall(_ == 0)))
    // lut b/cc are 0 on degenerate dims → distance ignores the codes there
    val lut = ScalarQuantization.sqLut(Seq.fill(4)(0.25f) ++ vec(3L).take(4), mins, maxs)
    (0 until 4).foreach { i => assert(lut(3 * i + 1) == 0L && lut(3 * i + 2) == 0L) }
  }

  test("BQ: kernel and driver-side encode agree bit-for-bit; hamming kernel equals bit count") {
    val thr = BinaryQuantization.collectThresholds(BinaryQuantization.bqTrain(items))
    assert(thr.length == dims)
    val enc = BinaryQuantization.bqEncode(items, thr)
      .select(col("vec_id"), col("bq")).as[(Long, Array[Byte])].collect().toMap
    val vecs = items.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(enc(id), BinaryQuantization.bqEncodeLocal(v, thr)),
        s"vec $id kernel/local mismatch")
    }
    // hamming kernel vs naive per-bit comparison against probe 7
    val qb = BinaryQuantization.bqEncodeLocal(vecs(7L), thr)
    val probeDf = Seq((7L, qb)).toDF("qid", "qb")
    val kernel = BinaryQuantization.bqEncode(items, thr)
      .crossJoin(broadcast(probeDf.select(col("qb"))))
      .select(col("vec_id"), bq_hamming(col("bq"), col("qb")).as("h"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      val manual = (0 until dims).count { i =>
        (v(i).toDouble > thr(i)) != (vecs(7L)(i).toDouble > thr(i))
      }
      assert(kernel(id) == manual, s"vec $id: kernel ${kernel(id)} != manual $manual")
    }
    assert(kernel(7L) == 0)
  }

  test("BQ full-width refine equals brute force; moderate refine keeps decent recall") {
    val thr = BinaryQuantization.collectThresholds(BinaryQuantization.bqTrain(items))
    val enc = BinaryQuantization.bqEncode(items, thr)
    val probes = (0L until 5L).map(i => (i, vec(i)))
    val probeDf = probes.toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    val exact = SimilaritySearch.bruteForceTopK(items, probeDf, k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val full = BinaryQuantization.bqTopK(enc, items, thr, probes, k = 5, refine = 40)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
    // 1 bit/dim is lossy — hamming is only a coarse proxy for cosine, so
    // the floor is lower than SQ's (it exists to catch regressions, not to
    // promise recall)
    val bq = BinaryQuantization.bqTopK(enc, items, thr, probes, k = 5, refine = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(bq).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF × SQ pruned: partition filter + codes-only scan; full width equals brute force") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sqivf").toString
    val (assigned, centroids) = SimilaritySearch.ivfAssign(items, nCells = 8)
    val (mins, maxs) = params
    ScalarQuantization.sqIndexWrite(
      ScalarQuantization.sqEncode(assigned, mins, maxs).select("vec_id", "cell", "sq"),
      ScalarQuantization.sqTrain(items), s"$tmp/sqivf", Some(centroids))
    val probes = (0L until 3L).map(i => (i, vec(i)))
    // full probe width + full refine ⇒ identical to brute force
    val full = ScalarQuantization.ivfSqTopKPruned(spark, s"$tmp/sqivf", items,
        probes, k = 5, nProbe = 8, refine = 40)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val exact = SimilaritySearch.bruteForceTopK(items,
        probes.toDF("qid", "qv").select(col("qid"), col("qv").cast("array<float>").as("qv")),
        k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
    // narrow probe: the scan carries a static partition filter AND reads
    // codes only (the float vector never enters the candidate scan)
    val p = ScalarQuantization.ivfSqTopKPruned(spark, s"$tmp/sqivf", items,
      probes, k = 5, nProbe = 2).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined, p)
    val codeScans = "ReadSchema: [^\\n]*sq:binary".r.findAllIn(p).toSeq
    assert(codeScans.nonEmpty && codeScans.forall(!_.contains("embedding")), p)
  }

  test("IVF × BQ pruned: partition filter + bit-codes-only scan; full width equals brute force") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bqivf").toString
    val (assigned, centroids) = SimilaritySearch.ivfAssign(items, nCells = 8)
    val thr = BinaryQuantization.collectThresholds(BinaryQuantization.bqTrain(items))
    BinaryQuantization.bqIndexWrite(
      BinaryQuantization.bqEncode(assigned, thr).select("vec_id", "cell", "bq"),
      BinaryQuantization.bqTrain(items), s"$tmp/bqivf", Some(centroids))
    val probes = (0L until 3L).map(i => (i, vec(i)))
    val full = BinaryQuantization.ivfBqTopKPruned(spark, s"$tmp/bqivf", items,
        probes, k = 5, nProbe = 8, refine = 40)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val exact = SimilaritySearch.bruteForceTopK(items,
        probes.toDF("qid", "qv").select(col("qid"), col("qv").cast("array<float>").as("qv")),
        k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
    val p = BinaryQuantization.ivfBqTopKPruned(spark, s"$tmp/bqivf", items,
      probes, k = 5, nProbe = 2).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined, p)
    val codeScans = "ReadSchema: [^\\n]*bq:binary".r.findAllIn(p).toSeq
    assert(codeScans.nonEmpty && codeScans.forall(!_.contains("embedding")), p)
  }

  test("sqIndexWrite versions codes + params together; reader survives a rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sq").toString
    val (mins, maxs) = params
    ScalarQuantization.sqIndexWrite(
      ScalarQuantization.sqEncode(items, mins, maxs).select("vec_id", "sq"),
      ScalarQuantization.sqTrain(items), s"$tmp/sq")
    val p1 = ScalarQuantization.collectParams(ScalarQuantization.sqParamsRead(spark, s"$tmp/sq"))
    assert(p1._1.sameElements(mins) && p1._2.sameElements(maxs))
    // plan a read, rebuild with a shifted corpus, then execute the old plan:
    // the resolved version dir pins the consistent (codes, params) pair
    val pre = spark.read.parquet(
      graft.api.VersionedDir.resolve(spark, s"$tmp/sq"))
    val shifted = items.withColumn("embedding",
      transform(col("embedding"), x => x + lit(1.0f)))
    val (m2, x2) = ScalarQuantization.collectParams(ScalarQuantization.sqTrain(shifted))
    ScalarQuantization.sqIndexWrite(
      ScalarQuantization.sqEncode(shifted, m2, x2).select("vec_id", "sq"),
      ScalarQuantization.sqTrain(shifted), s"$tmp/sq")
    assert(pre.count() == 200)
    val p2 = ScalarQuantization.collectParams(ScalarQuantization.sqParamsRead(spark, s"$tmp/sq"))
    assert(!p2._1.sameElements(mins))
  }
}
