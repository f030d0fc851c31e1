package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SparkInternals.{toColumn, toExpression, AbstractDataType}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector distance/similarity over
  * `array<float>` columns — the engine's hot path (brute-force KNN is a full
  * scan × distance per row; reference numpy provider storage/numpy/provider.py:38-59
  * is an interpreted Python loop; here it's whole-stage-codegen'd Java).
  *
  * All math accumulates in double, left-to-right in array index order, so a
  * DuckDB oracle computing over `embedding::DOUBLE[]` is bit-identical.
  *
  * The reference numpy provider has an operator-precedence bug
  * (`dot/‖q‖*‖d‖`, provider.py:47-51); we implement true cosine
  * `dot/(‖q‖·‖d‖)` (SURVEY.md §7 risk 3 — intentional divergence).
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** dot(a, b) = Σ a(i)·b(i) over the common prefix length. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int i = 0; i < ${ev.value}_n; i++) {
         |  ${ev.value}_s += (double)$a.getFloat(i) * (double)$b.getFloat(i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖); 0.0 when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |int ${v}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${v}_dot = 0.0; double ${v}_na = 0.0; double ${v}_nb = 0.0;
         |for (int i = 0; i < ${v}_n; i++) {
         |  double x = (double)$a.getFloat(i);
         |  double y = (double)$b.getFloat(i);
         |  ${v}_dot += x * y; ${v}_na += x * x; ${v}_nb += y * y;
         |}
         |double ${v}_den = java.lang.Math.sqrt(${v}_na) * java.lang.Math.sqrt(${v}_nb);
         |$v = (${v}_den == 0.0) ? 0.0 : ${v}_dot / ${v}_den;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Euclidean distance ‖a-b‖₂. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2"
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |int ${v}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${v}_s = 0.0;
         |for (int i = 0; i < ${v}_n; i++) {
         |  double d = (double)$a.getFloat(i) - (double)$b.getFloat(i);
         |  ${v}_s += d * d;
         |}
         |$v = java.lang.Math.sqrt(${v}_s);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

/** L2 norm ‖a‖₂ of a float vector. */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "vec_norm"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |double ${v}_s = 0.0;
         |for (int i = 0; i < $a.numElements(); i++) {
         |  double x = (double)$a.getFloat(i);
         |  ${v}_s += x * x;
         |}
         |$v = java.lang.Math.sqrt(${v}_s);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): L2Norm = copy(child = newChild)
}

/** Per-row nearest-centroid assignment against a plan-time centroid table:
  * returns the id of the L2-closest centroid (ties → smallest id). One
  * projection, zero joins/shuffles — the scale-correct IVF assignment (the
  * centroid set is tiny by construction, nCells ≤ a few thousand).
  *
  * Distance accumulates exactly like [[L2Distance]] (left-to-right double
  * over the common prefix, then sqrt), so the result is bit-identical to
  * the crossJoin+argmin formulation and its DuckDB twin.
  */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Float]], cids: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(centroids.length == cids.length && centroids.nonEmpty, "need >= 1 centroid")
  override def prettyName: String = "nearest_centroid"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  private def dist(x: ArrayData, c: Array[Float]): Double = {
    val n = math.min(x.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - c(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bestCid = cids(0)
    var bestD = dist(x, centroids(0))
    var j = 1
    while (j < centroids.length) {
      val d = dist(x, centroids(j))
      if (d < bestD || (d == bestD && cids(j) < bestCid)) { bestD = d; bestCid = cids(j) }
      j += 1
    }
    bestCid
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** [[NearestCentroidExpr]] returning BOTH the winning cell id and its L2
  * distance as struct(cell, dist) — one pass over the centroid table where
  * assignment-then-distance-lookup would scan it twice. Distance accumulates
  * exactly like [[L2Distance]], so `dist` is bit-identical to
  * `l2(v, centroid[cell])` and its DuckDB twin.
  */
case class NearestCentroidDistExpr(child: Expression, centroids: Array[Array[Float]], cids: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(centroids.length == cids.length && centroids.nonEmpty, "need >= 1 centroid")
  override def prettyName: String = "nearest_centroid_dist"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  private def dist(x: ArrayData, c: Array[Float]): Double = {
    val n = math.min(x.numElements(), c.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - c(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bestCid = cids(0)
    var bestD = dist(x, centroids(0))
    var j = 1
    while (j < centroids.length) {
      val d = dist(x, centroids(j))
      if (d < bestD || (d == bestD && cids(j) < bestCid)) { bestD = d; bestCid = cids(j) }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestCid, bestD)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDistExpr =
    copy(child = newChild)
}

/** The `nProbe` nearest centroid ids (L2 asc, id-asc ties), in rank order —
  * the probe-side cell selection of IVF search, again one projection.
  */
case class NearestCellsExpr(child: Expression, centroids: Array[Array[Float]], cids: Array[Long], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(centroids.length == cids.length && centroids.nonEmpty, "need >= 1 centroid")
  override def prettyName: String = "nearest_cells"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scored = Array.tabulate(centroids.length) { j =>
      val c = centroids(j)
      val n = math.min(x.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) { val d = x.getFloat(i).toDouble - c(i).toDouble; s += d * d; i += 1 }
      (math.sqrt(s), cids(j))
    }
    val top = scored.sortBy { case (d, cid) => (d, cid) }.take(nProbe).map(_._2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(top)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

/** Product-quantization encoder: split the vector into `m` subvectors of
  * `dsub` dims each and replace every subvector with the index of its
  * L2²-nearest codeword in that subspace's codebook (ties → smaller code).
  * Output is `array<int>` of length `m` — at m=8 that is 8 small ints where
  * the raw vector was 64 floats (32× smaller on disk/in shuffle), which is
  * what makes candidate scoring over a 100 TB embedding corpus fit in
  * memory. Squared distance (no sqrt — argmin-equivalent) accumulates
  * left-to-right in double like [[NearestCentroidExpr]], so a DuckDB twin
  * over `DOUBLE[]` slices is bit-identical.
  */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Float]]], dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "need >= 1 codeword per subspace")
  override def prettyName: String = "pq_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = codebooks.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        val n = math.min(dsub, math.max(0, x.numElements() - off))
        var d2 = 0.0
        var i = 0
        while (i < n) {
          val d = x.getFloat(off + i).toDouble - c(i).toDouble
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; bestJ = j } // first win = smallest code on ties
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) lookup: given a row's PQ codes and a probe's
  * flattened lookup table (`lut[s*ksub + j]` = scaled-long partial distance
  * between the probe's subvector `s` and codeword `j`), the candidate
  * distance is `Σ_s lut[s*ksub + codes[s]]` — `m` array reads and integer
  * adds per row, no float math at all. The LUT entries are
  * `round(d² · 10⁶)` longs, so the sum is EXACT and order-independent:
  * a SQL oracle summing the same longs hash-matches bit-for-bit.
  */
case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "pq_adc"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    val m = codes.numElements()
    while (i < m) {
      s += lut.getLong(i * ksub + codes.getInt(i))
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |long ${v}_s = 0L;
         |int ${v}_m = $a.numElements();
         |for (int i = 0; i < ${v}_m; i++) {
         |  ${v}_s += $b.getLong(i * $ksub + $a.getInt(i));
         |}
         |$v = ${v}_s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Scalar quantization (SQ8) encode: per-dimension affine map of a float
  * vector onto one byte — `code_i = round((x_i − min_i) · 255 / (max_i −
  * min_i))`, clamped to [0, 255]; degenerate dimensions (max = min) encode
  * as 0. Output is `binary` of length d: exactly 1 byte per dimension (4×
  * smaller than float32) — the qdrant "scalar quantization" storage mode.
  * All arithmetic is double, left-to-right, so a DuckDB twin over
  * `DOUBLE` casts is bit-identical; `Math.round` ties and SQL `round` ties
  * agree because the pre-clamp value is non-negative.
  */
case class SqEncodeExpr(child: Expression, mins: Array[Float], maxs: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(mins.length == maxs.length && mins.nonEmpty, "per-dimension min/max required")
  override def prettyName: String = "sq_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = math.min(mins.length, x.numElements())
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val mn = mins(i).toDouble
      val mx = maxs(i).toDouble
      val code =
        if (mx > mn) {
          val t = (x.getFloat(i).toDouble - mn) * 255.0 / (mx - mn)
          math.min(255L, math.max(0L, Math.round(t)))
        } else 0L
      out(i) = code.toByte
      i += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): SqEncodeExpr =
    copy(child = newChild)
}

/** SQ asymmetric distance: exact scaled-long L2² between a probe and a
  * quantized row, computed from the codes alone. Per dimension the LUT
  * carries three longs (`lut[3i] = round((q_i−min_i)²·10⁶)`,
  * `lut[3i+1] = round(2(q_i−min_i)·Δ_i/255·10⁶)`,
  * `lut[3i+2] = round((Δ_i/255)²·10⁶)`), and the candidate distance is
  * `Σ_i a_i − b_i·c_i + cc_i·c_i²` — integer adds/multiplies only, so the
  * sum is exact and order-independent (a SQL oracle summing the same longs
  * hash-matches bit-for-bit). Codegen'd: the hot loop stays inside
  * whole-stage codegen like [[PqAdcExpr]].
  */
case class SqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sq_adc"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    while (i < codes.length) {
      val c = (codes(i) & 0xFF).toLong
      s += lut.getLong(3 * i) - lut.getLong(3 * i + 1) * c + lut.getLong(3 * i + 2) * c * c
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |long ${v}_s = 0L;
         |for (int i = 0; i < $a.length; i++) {
         |  long ${v}_c = (long) ($a[i] & 0xFF);
         |  ${v}_s += $b.getLong(3 * i) - $b.getLong(3 * i + 1) * ${v}_c
         |      + $b.getLong(3 * i + 2) * ${v}_c * ${v}_c;
         |}
         |$v = ${v}_s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Binary quantization (BQ) encode: one bit per dimension — `bit_i =
  * x_i > thr_i` — packed LSB-first into `binary` of ⌈d/8⌉ bytes (32×
  * smaller than float32 at d=64: 8 bytes). Thresholds are per-dimension
  * corpus means computed from scaled-long sums, so they replay exactly in
  * SQL; the comparison is double > double — engine-exact.
  */
case class BqEncodeExpr(child: Expression, thresholds: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(thresholds.nonEmpty, "per-dimension thresholds required")
  override def prettyName: String = "bq_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = math.min(thresholds.length, x.numElements())
    val out = new Array[Byte]((d + 7) / 8)
    var i = 0
    while (i < d) {
      if (x.getFloat(i).toDouble > thresholds(i))
        out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
      i += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): BqEncodeExpr =
    copy(child = newChild)
}

/** Hamming distance between two packed bit codes: popcount of the bytewise
  * XOR — a handful of integer ops per row inside whole-stage codegen; the
  * BQ candidate scorer.
  */
case class BqHammingExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bq_hamming"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0
    var i = 0
    while (i < n) { s += Integer.bitCount((x(i) ^ y(i)) & 0xFF); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ev.value
      s"""
         |int ${v}_s = 0;
         |int ${v}_n = Math.min($a.length, $b.length);
         |for (int i = 0; i < ${v}_n; i++) {
         |  ${v}_s += Integer.bitCount(($a[i] ^ $b[i]) & 0xFF);
         |}
         |$v = ${v}_s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BqHammingExpr =
    copy(left = newLeft, right = newRight)
}

/** Unpack SQ codes (`binary`) to `array<int>` of 0..255 — the gate/debug
  * view of a quantized column (posexplode-able; the scan path never needs
  * this, it scores bytes directly via [[SqAdcExpr]]).
  */
case class SqCodesExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "sq_codes"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  protected override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val out = new Array[Int](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i) & 0xFF; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): SqCodesExpr =
    copy(child = newChild)
}

/** Column-level API. */
object vector {
  def vec_dot(a: Column, b: Column): Column = toColumn(DotProduct(toExpression(a), toExpression(b)))
  def vec_cosine(a: Column, b: Column): Column = toColumn(CosineSimilarity(toExpression(a), toExpression(b)))
  def vec_l2(a: Column, b: Column): Column = toColumn(L2Distance(toExpression(a), toExpression(b)))
  def vec_norm(a: Column): Column = toColumn(L2Norm(toExpression(a)))
  def nearest_centroid(v: Column, centroids: Array[Array[Float]], cids: Array[Long]): Column =
    toColumn(NearestCentroidExpr(toExpression(v), centroids, cids))
  def nearest_cells(v: Column, centroids: Array[Array[Float]], cids: Array[Long], nProbe: Int): Column =
    toColumn(NearestCellsExpr(toExpression(v), centroids, cids, nProbe))
  def nearest_centroid_dist(v: Column, centroids: Array[Array[Float]], cids: Array[Long]): Column =
    toColumn(NearestCentroidDistExpr(toExpression(v), centroids, cids))
  def pq_encode(v: Column, codebooks: Array[Array[Array[Float]]], dsub: Int): Column =
    toColumn(PqEncodeExpr(toExpression(v), codebooks, dsub))
  def pq_adc(codes: Column, lut: Column, ksub: Int): Column =
    toColumn(PqAdcExpr(toExpression(codes), toExpression(lut), ksub))
  def sq_encode(v: Column, mins: Array[Float], maxs: Array[Float]): Column =
    toColumn(SqEncodeExpr(toExpression(v), mins, maxs))
  def sq_adc(codes: Column, lut: Column): Column =
    toColumn(SqAdcExpr(toExpression(codes), toExpression(lut)))
  def sq_codes(codes: Column): Column = toColumn(SqCodesExpr(toExpression(codes)))
  def bq_encode(v: Column, thresholds: Array[Double]): Column =
    toColumn(BqEncodeExpr(toExpression(v), thresholds))
  def bq_hamming(a: Column, b: Column): Column =
    toColumn(BqHammingExpr(toExpression(a), toExpression(b)))
}
