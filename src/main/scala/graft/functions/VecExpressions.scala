package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over numeric array columns (float or double
  * element type on either side; result is double, accumulated left to
  * right).
  *
  * This is the hot inner loop of cosine similarity / sign-LSH at 100 TB
  * scale: a native Catalyst `Expression` with `doGenCode` keeps the scan →
  * similarity → top-k pipeline inside whole-stage codegen, unlike the
  * higher-order-function composition (`zip_with`+`aggregate`), which
  * evaluates interpreted per element, and unlike a Scala UDF, which breaks
  * codegen and pays ser/de per row.
  *
  * Array elements are assumed non-null (parquet embeddings here are
  * non-null by construction); lengths must match, enforced at runtime.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n, s"vec_dot: length mismatch $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    val lf = leftIsFloat; val rf = rightIsFloat
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: two VecDot instances can land in one codegen scope
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val xGet = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yGet = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException("vec_dot: length mismatch");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($xGet) * ($yGet);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Codegen'd banded sign-LSH signature: for each band `b` of
  * `planesPerBand` hyperplanes, bit `i` of the band signature is
  * sign(dot(v, plane_{b·planesPerBand+i})). Returns `array<bigint>` with
  * one signature per band.
  *
  * One fused pass per row — the plane matrix rides into the generated code
  * as a reference object, so computing 32 plane dots costs one tight
  * double loop instead of 32 separate interpreted higher-order-function
  * trees. Bands are the ANN candidate keys (match ≥1 band ⇒ candidate).
  */
case class VecLshSignature(child: Expression, planes: Array[Array[Double]],
                           planesPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.length % planesPerBand == 0,
    "planes.length must be a positive multiple of planesPerBand")
  private val bands = planes.length / planesPerBand

  // Structural equality over the plane matrix: the case-class default
  // compares the Array field by reference, so two semantically identical
  // signature expressions would never canonicalize — common-subexpression
  // elimination would then run the full plane loop once per occurrence.
  override def equals(other: Any): Boolean = other match {
    case v: VecLshSignature =>
      planesPerBand == v.planesPerBand && child == v.child &&
        java.util.Arrays.deepEquals(
          planes.asInstanceOf[Array[AnyRef]], v.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(planesPerBand),
      Integer.valueOf(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_lsh_sig requires array<float|double> input, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](bands)
    val f = isFloat
    require(n == planes(0).length,
      s"vec_lsh_sig: vector dim $n != plane dim ${planes(0).length}")
    var b = 0
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < planesPerBand) {
        val p = planes(b * planesPerBand + i)
        var acc = 0.0
        var j = 0
        while (j < n) {
          acc += p(j) * (if (f) v.getFloat(j).toDouble else v.getDouble(j))
          j += 1
        }
        if (acc >= 0) sig |= (1L << i)
        i += 1
      }
      out(b) = sig
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      // fresh locals: two instances can land in one codegen scope
      val numEl = ctx.freshName("numEl"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
      s"""
         |int $numEl = $v.numElements();
         |if ($numEl != ${planes(0).length}) {
         |  throw new IllegalArgumentException(
         |    "vec_lsh_sig: vector dim " + $numEl + " != plane dim ${planes(0).length}");
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $i = 0; $i < $planesPerBand; $i++) {
         |    double[] $p = $planesRef[$b * $planesPerBand + $i];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $numEl; $j++) {
         |      $acc += $p[$j] * (double) $v.$get($j);
         |    }
         |    if ($acc >= 0) $sig |= (1L << $i);
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_lsh_sig"
}

/** Codegen'd order-preserving radix cell of a double: the top `topBits`
  * of the IEEE-754 bit pattern after the standard total-order flip
  * (negatives bit-inverted, positives sign-flipped), as an int in
  * [0, 2^topBits). Monotone in the double value, computed WITHOUT
  * knowing the data's range — the bucketing primitive that lets a
  * histogram-selection pass (grouped weighted median / exact quantile
  * narrowing) run on the FIRST scan, fused with the totals aggregate,
  * instead of needing a min/max pre-pass. One cell spans at most 1/16
  * of an octave at topBits=16 (4 mantissa bits), so any
  * non-adversarial value distribution concentrates a cell's rows far
  * below a driver-collect budget.
  */
case class DoubleRadixCell(child: Expression, topBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(topBits >= 1 && topBits <= 31, "topBits must fit a non-negative int")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_radix_cell requires a double input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bits = java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])
    val flipped = if (bits < 0) ~bits else bits ^ java.lang.Long.MIN_VALUE
    (flipped >>> (64 - topBits)).toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits")
      val flipped = ctx.freshName("flipped")
      s"""
         |long $bits = Double.doubleToRawLongBits($v);
         |long $flipped = ($bits < 0L) ? ~$bits : ($bits ^ Long.MIN_VALUE);
         |${ev.value} = (int) ($flipped >>> ${64 - topBits});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "double_radix_cell"
}

/** Codegen'd PQ asymmetric-distance (ADC) lookup: approximate cosine of
  * a float query against an m-byte PQ code, via per-probe lookup tables.
  * `dotFlat` / `n2Flat` are the probe's flattened m×k tables (entry
  * j·k+c = query-subvector·centroid dot, resp. centroid norm²) and ride
  * the batch plan as COLUMNS of the broadcast probe relation — computed
  * once per probe on executors, never on the driver. Scoring a code is
  * then m array lookups inside whole-stage codegen (O(m) per corpus row
  * instead of O(dim)) — the VecDot discipline applied to the PQ scan.
  * Subspaces are disjoint coordinates, so the reconstruction's norm² is
  * exactly the sum of its centroids' norm²s; a zero denominator scores
  * 0 (the bruteForceTopK zero-vector convention).
  */
case class PqAdcScore(dotFlat: Expression, n2Flat: Expression,
                      qnorm: Expression, code: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  require(k >= 1 && k <= 256, "k must fit one byte per subspace")

  override def first: Expression = dotFlat
  override def second: Expression = n2Flat
  override def third: Expression = qnorm
  override def fourth: Expression = code

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arr(dotFlat) && arr(n2Flat) && qnorm.dataType == DoubleType &&
        code.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_score requires (array<double>, array<double>, double, binary), got " +
        Seq(dotFlat, n2Flat, qnorm, code).map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(dt: Any, n2: Any, qn: Any, cd: Any): Any = {
    val dta = dt.asInstanceOf[ArrayData]
    val n2a = n2.asInstanceOf[ArrayData]
    val q = qn.asInstanceOf[Double]
    val codes = cd.asInstanceOf[Array[Byte]]
    var dot = 0.0
    var norm2 = 0.0
    var j = 0
    while (j < codes.length) {
      val c = codes(j) & 0xff
      dot += dta.getDouble(j * k + c)
      norm2 += n2a.getDouble(j * k + c)
      j += 1
    }
    val denom = q * math.sqrt(norm2)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dt, n2, qn, cd) => {
      val dot = ctx.freshName("dot"); val norm2 = ctx.freshName("norm2")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val denom = ctx.freshName("denom")
      s"""
         |double $dot = 0.0;
         |double $norm2 = 0.0;
         |for (int $j = 0; $j < $cd.length; $j++) {
         |  int $c = $cd[$j] & 0xff;
         |  $dot += $dt.getDouble($j * $k + $c);
         |  $norm2 += $n2.getDouble($j * $k + $c);
         |}
         |double $denom = $qn * Math.sqrt($norm2);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(dotFlat = newFirst, n2Flat = newSecond, qnorm = newThird,
      code = newFourth)

  override def prettyName: String = "pq_adc_score"
}
