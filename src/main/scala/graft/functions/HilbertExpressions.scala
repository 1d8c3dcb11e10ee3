package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve position of n already-bucketed rank columns — the
  * clustering key OPTIMIZE sorts by when `graft.clustering.curve =
  * hilbert` (see [[graft.operators.HilbertCurve]] for why the curve
  * beats Z-order's interleave for multi-column skipping).
  *
  * A custom expression rather than a UDF so the layout job's key
  * computation stays inside whole-stage codegen: the generated code
  * builds one small long[] and calls the shared static transform —
  * O(1) generated-code size at any column count, the identical
  * function interpreted and compiled. Inputs are the rank columns
  * (int or long, in [0, 2^bits)); they are non-null by construction
  * (rank = a when-chain over quantile bounds), and a null anywhere
  * yields a null key, which the layout sort would put in one place —
  * fail-safe, not wrong. */
case class HilbertIndexExpr(children: Seq[Expression], bits: Int)
    extends Expression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.isEmpty || children.length * bits > 62)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index: need 1 <= cols*bits <= 62, got " +
          s"${children.length} cols * $bits bits")
    else if (!children.forall(c =>
        c.dataType == IntegerType || c.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hilbert_index expects int/long rank columns")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v match {
        case l: Long => l
        case n: Int => n.toLong
      }
      i += 1
    }
    graft.operators.HilbertCurve.index(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val loads = evals.zipWithIndex.map { case (e, i) =>
      code"""
        ${e.code}
        if (${e.isNull}) { ${ev.isNull} = true; }
        else { $arr[$i] = (long) ${e.value}; }
      """
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        long[] $arr = new long[${children.length}];
        $loads
        if (!${ev.isNull}) {
          ${ev.value} = graft.operators.HilbertCurve.index($arr, $bits);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexExpr =
    copy(children = newChildren)
}

object HilbertFunctions {
  def hilbertIndex(bits: Int, cols: Column*): Column =
    Shims.column(HilbertIndexExpr(cols.map(Shims.expression), bits))
}
