package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd constant-matrix × vector product — the JL random
  * projection core ([[graft.similarity.Projection]]). The naive column
  * form (outDim × dim literal multiply-add expressions) exceeds janino's
  * method limits at 16 × 64, silently dropping the whole stage out of
  * codegen into interpreted evaluation (measured 7×); this expression is
  * ONE tight nested Java loop over a matrix shipped as a reference
  * object, inside whole-stage codegen.
  *
  * Row sums accumulate left-to-right and divide by `scale` once, so
  * results are bit-identical to the literal-expression form and to an
  * external engine replaying the same constants in the same fold order.
  * Null contract: a null element or a vector whose length differs from
  * the matrix width yields NULL.
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]],
    scale: Double) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matvec"
  override def nullable: Boolean = true

  private def elemType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float|double> input, got ${t.sql}")
    }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = matrix(0).length
    if (v.numElements() != dim) return null
    val t = elemType
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        val x = t match {
          case FloatType => v.getFloat(i).toDouble
          case DoubleType => v.getDouble(i)
        }
        s += x * row(i)
        i += 1
      }
      out(j) = s / scale
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val getter = elemType match {
        case FloatType  => s"(double) $v.getFloat"
        case DoubleType => s"$v.getDouble"
      }
      val dim = ctx.freshName("dim"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val row = ctx.freshName("row")
      s"""
         |int $dim = $m[0].length;
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$m.length];
         |  for (int $j = 0; $j < $m.length && !${ev.isNull}; $j++) {
         |    double[] $row = $m[$j];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $s += ${getter}($i) * $row[$i];
         |    }
         |    $out[$j] = $s / $scale;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
}

object MatVec {
  /** Column wrapper: `matVecNative(v, m, scale)` = [m · v] / scale. */
  def matVecNative(v: Column, matrix: Array[Array[Double]],
      scale: Double): Column =
    Shims.column(MatVec(Shims.catalystExpression(v), matrix, scale))
}
