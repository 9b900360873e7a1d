package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd ADC (asymmetric-distance) lookup sum for product
  * quantization: `Σ_s dt(s)(codes(s))` over `codes ARRAY<INT>` and a
  * per-query lookup table `dt ARRAY<ARRAY<BIGINT>>` — one fused Java
  * loop of m array reads per corpus row, replacing the interpreted
  * aggregate-over-sequence + nested element_at fold (the hot inner loop
  * of the PQ code scan; SURVEY.md §2.9 escalation rule: compose
  * built-ins, then a custom Expression).
  *
  * Integer addition is associative, so the result is bit-identical to
  * the HOF form. Null contract: a null input, mismatched m (|codes| ≠
  * |dt|), a null element, or an out-of-range code yields NULL — the PQ
  * encode/table builders guarantee 0 ≤ code < k and matching m, so a
  * NULL here marks corrupted inputs rather than a recoverable state.
  */
case class AdcDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "adc_distance"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<bigint>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val dt = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != dt.numElements()) return null
    var sum = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || dt.isNullAt(s)) return null
      val c = codes.getInt(s)
      val row = dt.getArray(s)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      sum += row.getLong(c)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, dt) => {
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val sum = ctx.freshName("sum"); val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      s"""
         |int $m = $codes.numElements();
         |if ($m != $dt.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($codes.isNullAt($s) || $dt.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    int $c = $codes.getInt($s);
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $dt.getArray($s);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $sum += $row.getLong($c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object AdcDistance {
  def adcNative(codes: Column, dt: Column): Column =
    Shims.column(AdcDistance(Shims.expression(codes), Shims.expression(dt)))
}
