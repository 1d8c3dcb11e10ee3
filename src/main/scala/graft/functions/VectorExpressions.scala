package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native dot product over two embedding arrays (float or double
  * elements), as a custom Catalyst expression.
  *
  * The composed alternative — 64 unrolled `element_at * element_at`
  * terms — is value-identical but generates ~400 codegen nodes per use;
  * three uses (dot + two norms) inside one fused stage blew past
  * Janino's method limits and silently dropped the whole stage to
  * interpreted execution. This expression emits a tight loop instead:
  * O(1) generated-code size at any dimensionality, same left-to-right
  * accumulation order, so results stay bit-identical to the unrolled
  * form and to the DuckDB oracle's `a[1]*b[1] + a[2]*b[2] + ...`.
  *
  * Null semantics match the unrolled form: null array, differing
  * lengths (an out-of-range `element_at` yields null), or any null
  * element → null result.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float|double>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val leftIsFloat = elemIsFloat(left)
  @transient private lazy val rightIsFloat = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (y.numElements() != n) return null
    val (lf, rf) = (leftIsFloat, rightIsFloat)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** Native ADC (asymmetric distance computation) score for product-
  * quantization search: `codes` is a vector's array of M one-byte
  * codewords, `lut` the probe's flattened M x K lookup table (m-major:
  * slot `m*k + code` holds `<probe sub-vector m, codeword code>`), and
  * the result is the quantized inner product `Σ_m lut[m*k + codes[m]]`.
  *
  * This expression exists because the composed alternatives stop
  * scaling with M. M equi-joins against per-(m, code) LUT slices (the
  * original q_knn_join_pq shape) is M-1 joins too many — fine at the
  * fixture's M=8, absurd at a production dim-512 index's M=64. M
  * unrolled `element_at(lit, ...)` terms codegen O(M·K) nodes per use
  * and re-compile per probe — the dim-512 rehearsal measured the
  * pairwise stage LOSING to exact scan on plan-compile overhead alone.
  * This emits one tight loop: O(1) generated code at any M, one array
  * access per subspace, left-to-right accumulation — bit-identical to
  * both composed forms and to the oracle's `l0.v + l1.v + ...` sum.
  *
  * Codes are unsigned on read (`& 0xFF`), so the full one-byte K=256
  * regime works even though the storage type is Spark's signed byte.
  * Null array, null element, or a code outside the LUT's K slots →
  * null (the composed `element_at` forms yield null there too).
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codesOk && lutOk && k > 0 && k <= 256)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<tinyint>, array<double>, 0 < k <= 256), " +
          s"got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString}, $k)")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (codes, lut) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val m = codes.numElements()
    if (lut.numElements() != m * k) return null
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val code = codes.getByte(i) & 0xFF
      if (code >= k) return null
      val slot = i * k + code
      if (lut.isNullAt(slot)) return null
      acc += lut.getDouble(slot)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val code = ctx.freshName("code")
      val slot = ctx.freshName("slot")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = $a.numElements();
         |if ($b.numElements() != $m * $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final int $code = $a.getByte($i) & 0xFF;
         |    final int $slot = $i * $k + $code;
         |    if ($code >= $k || $b.isNullAt($slot)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $b.getDouble($slot);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object VectorExpressions {
  /** Column API: dot product of two array<float|double> columns. */
  def vectorDot(a: Column, b: Column): Column =
    Shims.column(VectorDot(Shims.expression(a), Shims.expression(b)))

  /** Column API: ADC score of an array<byte> codes column against a
    * flattened M x K LUT column (`k` codewords per subspace). */
  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    Shims.column(PqAdc(Shims.expression(codes), Shims.expression(lut), k))
}
